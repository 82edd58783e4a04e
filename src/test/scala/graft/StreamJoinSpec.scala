package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.StreamingOps

/** Stream-stream interval join with watermarks on both sides:
  * purchases matched to clicks by the same user within the previous
  * hour. The watermark bounds the buffered state on both sides — the
  * property that makes the join runnable forever at scale.
  */
class StreamJoinSpec extends AnyFunSuite {
  import TestSession._

  test("stream-stream interval join matches the batch equivalent") {
    val events = Catalog.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_ssj").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = events.schema

    def clicks(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    def purchases(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    def joined(c: org.apache.spark.sql.DataFrame, p: org.apache.spark.sql.DataFrame) =
      p.join(c,
        col("p_user") === col("c_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))

    val stream = StreamingOps.readEventStream(spark, dir, schema)
    val q = StreamingOps.runToMemory(
      joined(clicks(stream), purchases(stream)), "ssj_test")
    try {
      val got = spark.table("ssj_test").count()
      val want = joined(clicks(events), purchases(events)).count()
      assert(got == want, s"stream=$got batch=$want")
      assert(want > 0, "test data produced no click→purchase pairs")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits watermark-evicted unmatched rows") {
    // Purchases LEFT OUTER clicks: matched rows emit like the inner
    // join; an unmatched purchase emits with NULL click once the
    // watermark proves no matching click can still arrive. Files are
    // range-ordered by ts so the watermark advances batch by batch
    // (maxFilesPerTrigger=1) and evictions actually happen mid-run.
    // The watermark delay (1 day) deliberately exceeds one file's
    // time-span (~1 day for 30 range files over 30 days): a shorter
    // delay makes Spark evict click state before cross-file matches
    // arrive — outer-join completeness only holds for data within the
    // watermark, the exact production contract.
    val events = Catalog.table(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_ssloj").toString
    events.repartitionByRange(30, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource replays in MODIFICATION-TIME order; parallel
    // part writes can land mtimes out of range order, which would
    // re-introduce late-data drops. Pin ascending mtimes so replay
    // order == event-time order (part file names are range-ordered).
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
      .zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
      }
    val schema = events.schema

    def clicks(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 day")
    def purchases(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 day")
    val cond = col("p_user") === col("c_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR")

    val stream = StreamingOps.readEventStream(spark, dir, schema)
    val q = StreamingOps.runToMemory(
      purchases(stream).join(clicks(stream), cond, "left_outer"), "ssloj_test")
    try {
      val got = spark.table("ssloj_test")
      val gotMatched = got.filter(col("c_user").isNotNull)
        .select(col("p_id"), col("click_ts")).collect().toSet
      val gotNulls = got.filter(col("c_user").isNull)
        .select(col("p_id")).collect().map(_.getLong(0)).toSet

      val batchMatched = purchases(events).join(clicks(events), cond)
        .select(col("p_id"), col("click_ts")).collect().toSet
      val batchMatchedIds = batchMatched.map(_.getLong(0))

      // 1. matched rows are exactly the batch inner join
      assert(gotMatched == batchMatched,
        s"matched mismatch: stream=${gotMatched.size} batch=${batchMatched.size}")
      // 2. every emitted NULL row is genuinely unmatched in batch
      assert(gotNulls.intersect(batchMatchedIds).isEmpty,
        "stream emitted a NULL row for a purchase that HAS a match")
      // 3. eviction really happened: the 30-day span with a 1-day
      //    watermark + range-ordered files must flush unmatched rows
      assert(gotNulls.nonEmpty, "no watermark-evicted unmatched rows emitted")
    } finally q.stop()
  }
}
