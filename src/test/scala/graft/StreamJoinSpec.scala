package graft

import java.nio.file.Files

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
}
