package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.6) over the events stream.
  *
  * Each transform is written against an unbounded DataFrame so the SAME
  * plan runs in batch (for the DuckDB-checked oracle queries) and as a
  * readStream (exercised in StreamingSpec with a memory sink). This is
  * the Spark-native equivalence the engine leans on: one declarative
  * plan, two execution modes.
  */
object StreamingOps {

  /** Tumbling-window counts/sums per event type with a watermark for
    * state cleanup (10 min lateness at 1 h windows keeps state bounded
    * regardless of input volume).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Open a file stream over a directory of events parquet (schema must
    * be supplied for streaming reads; maxFilesPerTrigger paces replay).
    */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Run a streaming frame into an in-memory sink until input drains —
    * the batch-equivalence harness used by the specs.
    */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append()): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming dedup: drop events whose key was already seen within
    * the watermark horizon — the at-least-once → exactly-once repair
    * stage of a streaming ingest pipeline. State stays bounded: keys
    * older than the watermark are evicted, so duplicate delivery
    * delayed past `lateness` is the (explicit, documented) miss window.
    * Batch mode degrades to dropDuplicates — same plan, two modes.
    */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           eventTime: String, lateness: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark(eventTime, lateness)
        .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else
      events.dropDuplicates(idCols.head, idCols.tail: _*)

  /** Durable file sink: append-mode parquet with a checkpoint — the
    * production sink shape (exactly-once via the sink's transaction log
    * + WAL offsets; a restart resumes from the checkpoint without
    * duplicating output files). Runs until current input drains.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q
  }
}
