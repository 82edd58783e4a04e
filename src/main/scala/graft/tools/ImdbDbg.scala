package graft.tools

/** Transient diagnostic for ImdbWitness solve failures. */
object ImdbDbg {
  def main(a: Array[String]): Unit = {
    val want = if (a.isEmpty) Seq("11b", "11c") else a.toSeq
    graft.queries.Imdb.queries.zipWithIndex
      .filter(q => want.contains(q._1._1))
      .foreach { case ((qid, q), qi) =>
        println(s"=== $qid idx=$qi")
        val r = graft.queries.ImdbWitness.witnessRows(q, qi)
        println(s"witness rows: ${r.map(_.length)}")
        r.foreach(_.foreach { case (t, row) =>
          println(s"  $t: ${row.toSeq.sortBy(_._1).mkString(", ")}")
        })
      }
  }
}
