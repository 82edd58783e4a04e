package graft.tools

/** r14: same-JVM A/B probe. The box's absolute speed swings ~1.5×
  * within a session (r13 lesson — and r14 measured d04 15→39 s on
  * IDENTICAL code across JVMs an hour apart), so cross-JVM pairs
  * cannot resolve sub-30% effects. This tool alternates a boolean
  * system property OFF/ON between iterations of the same entry inside
  * ONE JVM — page cache, JIT state and heap shape are shared by both
  * sides, and the interleaving cancels slow drift.
  *
  * Run: tools/run_main.sh graft.tools.AbProf <sfDir> <entry> <prop>[=offVal:onVal] [rounds]
  * e.g. ... AbProf /tmp/graftdata/sf10 d07_dedup_star_clusters graft.lsh.sharedBucketEx 3
  *      ... AbProf /root/testdata/sf0.1 tpch_q18 \
  *            spark.sql.adaptive.coalescePartitions.minPartitionSize=1048576:262144 3
  * A `spark.`-prefixed key toggles the SESSION SQL conf (A=offVal,
  * B=onVal); anything else toggles a system property ("0"/"1").
  */
object AbProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val propSpec = args(2)
    val rounds = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.adaptScanParallelism(s, dir)
    val (prop, offVal, onVal) = propSpec.split('=') match {
      case Array(k, vs) => val Array(a, b) = vs.split(':'); (k, a, b)
      case Array(k)     => (k, "0", "1")
    }
    val fn = graft.SparkEntry.queries(name)
    def once(side: Boolean): Double = {
      val v = if (side) onVal else offVal
      if (prop.startsWith("spark.")) s.conf.set(prop, v) else sys.props(prop) = v
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one unmeasured warm-up per side (codegen both plan shapes)
    once(false); once(true)
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    (1 to rounds).foreach { i =>
      System.gc(); Thread.sleep(300); System.gc()
      a += once(false)
      System.gc(); Thread.sleep(300); System.gc()
      b += once(true)
      println(f"[ab] round $i  A(off)=${a.last}%.3f  B(on)=${b.last}%.3f")
    }
    if (!prop.startsWith("spark.")) sys.props.remove(prop)
    def stats(x: Seq[Double]) = f"min=${x.min}%.3f median=${x.sorted.apply(x.size / 2)}%.3f"
    println(s"[ab] $name $prop  A(off): ${stats(a.toSeq)}  B(on): ${stats(b.toSeq)}")
    s.stop()
  }
}
