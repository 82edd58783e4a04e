package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.StreamingOps

/** Batch/stream equivalence: the SAME windowedAgg plan run (a) in
  * batch and (b) incrementally over a file stream must agree — the
  * Structured Streaming contract the engine leans on (SURVEY §2.6).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  test("windowedAgg streamed over events equals the batch result") {
    val batchEvents = Catalog.table(spark, sfDir, "events")
    val schema = batchEvents.schema

    // stage the events into a stream-source dir (re-encoded so the
    // stream reader sees µs timestamps, not the raw NANOS parquet)
    val streamDir = Files.createTempDirectory("graft_stream").toString
    batchEvents.write.mode("overwrite").parquet(streamDir)

    val streamed = StreamingOps.windowedAgg(
      StreamingOps.readEventStream(spark, streamDir, schema))
    val q = StreamingOps.runToMemory(streamed, "st_window_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val got = spark.table("st_window_test")
        .orderBy(col("window_start"), col("event_type"))
        .collect()
      val want = StreamingOps.windowedAgg(batchEvents)
        .orderBy(col("window_start"), col("event_type"))
        .collect()
      // Append mode emits only watermark-closed windows; every emitted
      // row must match its batch counterpart, and most windows close.
      val wantMap = want.map(r => (r.get(0), r.get(1)) -> r).toMap
      assert(got.nonEmpty, "stream emitted nothing")
      got.foreach { r =>
        val key = (r.get(0), r.get(1))
        assert(wantMap.contains(key), s"stream emitted unknown window $key")
        assert(wantMap(key) == r, s"stream/batch mismatch at $key")
      }
    } finally q.stop()
  }
}
