package graft.tools

/** Disposable experiment runner (kept out of SparkEntry; contents
  * change per investigation). Current: front-door statement probes —
  * each arg runs through GraftSql.sql and prints rows or the error.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_SF_DIR")
      .foreach(dir => graft.sources.Catalog.registerAll(s, dir))
    args.foreach { q =>
      println(s"==== $q")
      try {
        val df = graft.GraftSql.sql(s, q)
        df.show(5, truncate = false)
      } catch {
        case e: Exception =>
          println(s"ERR ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
      }
    }
    s.stop()
  }
}
