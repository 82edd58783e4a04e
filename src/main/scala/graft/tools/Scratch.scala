package graft.tools

import org.apache.spark.sql.functions._

/** Disposable experiment runner (kept out of SparkEntry; contents
  * change per investigation). Current: locale collation orderings vs
  * the DuckDB ICU build for the q63 locale-matrix work.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val words = Seq("zebra", "apple", "ångström", "örebro", "ara", "ozon",
      "ilik", "ırmak", "中文", "国文", "文中").toDF("w")
    for (loc <- Seq("de", "tr", "sv", "zh")) {
      try {
        val r = words.orderBy(collate(col("w"), loc)).collect().map(_.getString(0))
        println(s"$loc ${r.mkString("[", ", ", "]")}")
      } catch { case e: Exception => println(s"$loc ERR ${e.getMessage.linesIterator.next()}") }
    }
    s.stop()
  }
}
