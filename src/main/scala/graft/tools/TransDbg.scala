object TransDbg {
  def main(args: Array[String]): Unit = {
    val texts =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "SELECT * FROM Cities PIVOT (SUM(Population) FOR Year IN (2000, 2010, 2020))")
    texts.foreach(t => println("====\n" + graft.plans.DuckDialect.translate(t)))
  }
}
