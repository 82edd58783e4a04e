package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.StreamingOps

/** Streaming dedup (ST5): duplicate delivery across micro-batches must
  * collapse to exactly-once output, matching the batch distinct over
  * the same duplicated input.
  */
class StreamDedupSpec extends AnyFunSuite {
  import TestSession._

  test("dropDuplicatesWithinWatermark repairs duplicate delivery") {
    val e = Catalog.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))

    // two copies of every event, in separate files so the duplicates
    // arrive in different micro-batches (maxFilesPerTrigger=1)
    val streamDir = Files.createTempDirectory("graft_dedup_src").toString
    e.coalesce(1).write.mode("overwrite").parquet(streamDir)
    e.coalesce(1).write.mode("append").parquet(streamDir)

    val schema = e.schema
    val streamed = StreamingOps.dedupWithinWatermark(
      StreamingOps.readEventStream(spark, streamDir, schema),
      Seq("event_id"), "ts", "10 minutes")
    val q = StreamingOps.runToMemory(streamed, "st_dedup_test")
    try {
      val got = spark.table("st_dedup_test").count()
      val want = e.count() // event_id is unique in the base table
      assert(got == want, s"streamed dedup kept $got of expected $want")
    } finally q.stop()
  }
}
