package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders + temp-view registry for the test star schema.
  *
  * All readers are plain declarative parquet scans so Catalyst gets
  * filter pushdown / column pruning for free (verify with
  * `.explain("formatted")`: PushedFilters + narrowed ReadSchema).
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor
    * (region/nation are fixed-size; supplier/part/customer grow slowly
    * vs. the fact tables — on a real 100 TB deployment customer moves
    * to the shuffle side and AQE decides from runtime stats).
    */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier", "part")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy long mode) and
    * truncate to microseconds — exactly what DuckDB does on read
    * (TIMESTAMP_NS → TIMESTAMP), so both engines see identical values.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsIsNanos = raw.schema("ts").dataType == LongType
    raw.select(raw.columns.map {
      // already µs timestamps (e.g. re-encoded copies): pass through
      case "ts" if tsIsNanos => expr("timestamp_micros(ts div 1000)").as("ts")
      case c                 => col(c)
    }: _*)
  }

  /** Register every table as a temp view (idempotent) so spark.sql
    * queries — correlated subqueries, CTEs, mark joins — can run
    * against the same data the DataFrame API sees.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { n => table(spark, sfDir, n).createOrReplaceTempView(n) }
}
