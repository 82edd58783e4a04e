package graft.tools

import org.apache.spark.sql.functions._

/** r11 investigation: (a) the flat q3/q10 scan-stage floor — is the
  * lineitem scan on the vectorized columnar reader end to end, and
  * what does the formatted plan show for the filter+projection
  * pipeline; (b) the q3_bucketed run-to-run variance — per-run
  * explain + stage wall breakdown.
  */
object ScanProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graftdata/sf10")
    val mode = args.headOption.getOrElse("flat")
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.adaptScanParallelism(s, dir) // match Bench (r14)
    val q = graft.SparkEntry.queries
    mode match {
      case "flat" =>
        val df = q(args.lift(1).getOrElse("tpch_q3"))(s, dir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case "join" =>
        args.drop(1).foreach { nm =>
          val plan = q(nm)(s, dir).queryExecution.executedPlan.toString
          println(s"== $nm ==")
          plan.linesIterator.filter(l =>
            l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin") ||
            l.contains("BroadcastHashJoin")).foreach(l => println("  " + l.trim.take(150)))
        }
      case "runs" =>
        // run/cpu as separate fields — a packed base-1e6 encoding
        // overflows the modulus past ~16.7 min of total task CPU
        val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Long, Int)]()
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
            stages.put(si.stageId, (si.name.takeWhile(_ != '.'), wall,
              si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000, si.numTasks))
          }
        })
        val n = args.lift(1).map(_.toInt).getOrElse(6)
        val qname = args.lift(2).getOrElse("tpch_q3_bucketed")
        // warm-ups: WARMUPS env (default 1, like Bench)
        val w = sys.env.getOrElse("WARMUPS", "1").toInt
        (1 to w).foreach(_ => q(qname)(s, dir)
          .write.format("noop").mode("overwrite").save())
        import scala.jdk.CollectionConverters._
        def gcMillis: Long = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
        (1 to n).foreach { i =>
          if (sys.env.get("NOGC").isEmpty) { System.gc(); Thread.sleep(300) }
          val g0 = gcMillis
          val t0 = System.nanoTime()
          val df = q(qname)(s, dir)
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          val plan = df.queryExecution.executedPlan.toString
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val ex = "ShuffleExchange".r.findAllIn(plan).length
          val gd = gcMillis - g0
          println(f"[run $i] $dt%.3f s  gc=${gd}ms  SMJ=$smj BHJ=$bhj ShufEx=$ex")
          import scala.jdk.CollectionConverters._
          stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (nm, wall, run, cpu, nt)) =>
            println(f"    stage $id%3d $nm%-20s wall=${wall}ms sumRun=${run}ms sumCpu=${cpu}ms tasks=$nt")
          }
          stages.clear()
        }
      case _ => sys.error(s"unknown mode $mode")
    }
    s.stop()
  }
}
