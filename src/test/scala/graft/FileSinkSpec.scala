package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.StreamingOps

/** Durable streaming sink (SURVEY §2.6): a checkpointed parquet file
  * sink must land exactly the rows the equivalent batch plan produces,
  * and a second run over the SAME checkpoint must not duplicate them —
  * the exactly-once contract a production pipeline relies on.
  */
class FileSinkSpec extends AnyFunSuite {
  import TestSession._

  test("parquet file sink lands the batch-equivalent rows exactly once") {
    val batchEvents = Catalog.table(spark, sfDir, "events")
    val schema = batchEvents.schema

    val streamDir = Files.createTempDirectory("graft_sink_src").toString
    batchEvents.write.mode("overwrite").parquet(streamDir)
    val outDir = Files.createTempDirectory("graft_sink_out").toString
    val ckptDir = Files.createTempDirectory("graft_sink_ckpt").toString

    def transform(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") =!= "view")
        .select(col("event_id"), col("user_id"), col("event_type"))

    val q = StreamingOps.runToParquet(
      transform(StreamingOps.readEventStream(spark, streamDir, schema)),
      outDir, ckptDir)
    q.stop()

    val want = transform(batchEvents).count()
    assert(spark.read.parquet(outDir).count() == want)

    // restart over the same checkpoint: input is fully consumed, so the
    // sink log must prevent any re-emission
    val q2 = StreamingOps.runToParquet(
      transform(StreamingOps.readEventStream(spark, streamDir, schema)),
      outDir, ckptDir)
    q2.stop()
    assert(spark.read.parquet(outDir).count() == want, "restart duplicated rows")
  }
}
