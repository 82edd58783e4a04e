package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** r14 optimization probe: per-bench-entry scheduling profile.
  *
  * For each named entry, runs warm-up + one measured noop-sink run and
  * reports wall seconds, job/stage/task counts and summed task time —
  * separating "many scheduling rounds over tiny data" (wall >> task
  * time / cores) from real compute. Run:
  *   tools/run_main.sh graft.tools.OptProf <sfDir> <entry>[,<entry>...]
  */
object OptProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(',').toSeq
      else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.adaptScanParallelism(s, dir) // match Bench

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(st.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskNanos.addAndGet(t.taskInfo.duration * 1000000L)
    })

    println(f"[optprof] ${"entry"}%-26s ${"wall"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSum"}%8s")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[optprof] $name: unknown entry")
        case Some(fn) =>
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(s, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm-up
          System.gc(); Thread.sleep(300); System.gc()
          Thread.sleep(200) // let the async listener bus drain
          jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
          val w = once()
          Thread.sleep(200)
          println(f"[optprof] $name%-26s $w%7.3f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskNanos.get / 1e9}%7.2fs")
      }
    }
    s.stop()
  }
}
