object TransDbg {
  def main(args: Array[String]): Unit = {
    val texts =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "SELECT * FROM Cities PIVOT (SUM(Population) FOR Year IN (2000, 2010, 2020))")
    texts.foreach { t =>
      // CREATE MACRO statements register (so later args expand
      // through them); everything else prints macro-expansion +
      // translation
      if (graft.plans.MacroReg.isCreate(t)) {
        graft.plans.MacroReg.register(t)
        println("==== registered macro")
      } else {
        val expanded = graft.plans.MacroReg.expand(t)
        if (expanded != t) println("==== expanded\n" + expanded)
        println("====\n" + graft.plans.DuckDialect.translate(expanded))
      }
    }
  }
}
