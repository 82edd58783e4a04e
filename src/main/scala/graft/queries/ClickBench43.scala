package graft.queries

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.GraftSql
import graft.sources.Catalog

/** The COMPLETE ClickBench query set — all 43 texts from the
  * reference's own benchmark tree
  * (/root/reference/benchmark/clickbench/queries/q01–q43.sql), read
  * at runtime and executed VERBATIM through the dialect front door
  * against a deterministic `hits` view derived from `events`.
  *
  * cb01–cb14 (ClickBench.scala) value-check the benchmark's plan
  * CLASSES with tie-safe orderings; this sweep closes benchmark
  * BREADTH: every one of the 43 official texts must parse, plan, and
  * execute. GATE STRENGTH (r10, the TpcdsFull pattern transferred):
  * each query is gated on row count AND — for the deterministic
  * subset — an order-insensitive VALUE fingerprint (md5 over sorted
  * per-row renderings under a positional fractional mask derived
  * from DuckDB DESCRIBE; see TpcdsFull's renderer contract). The
  * tie-ambiguous residue ([[countOnly]]) was MEASURED, not guessed:
  * Spark↔DuckDB fingerprint diff at the gate scale — top-N-by-count
  * orderings whose LIMIT cutoff lands on tied counts keep
  * engine-ambiguous row sets and gate on count alone.
  *
  * The `hits` view synthesizes the benchmark's columns from events
  * with closed-form arithmetic — one portable SQL text both engines
  * evaluate identically. The 2013 date-window queries (q37–q43)
  * return empty over 2024 data; they still exercise the full
  * filter+group+OFFSET pipeline on both engines.
  */
object ClickBench43 {

  private val queriesDir = "/root/reference/benchmark/clickbench/queries"

  lazy val texts: Seq[String] =
    (1 to 43).map { i =>
      val p = java.nio.file.Paths.get(f"$queriesDir/q$i%02d.sql")
      new String(java.nio.file.Files.readAllBytes(p)).trim.stripSuffix(";")
    }

  /** One deterministic, engine-portable hits projection over events. */
  val hitsViewSql: String =
    """SELECT
      |  event_id AS WatchID,
      |  CAST(event_id % 2 AS SMALLINT) AS JavaEnable,
      |  CASE WHEN event_id % 11 = 0 THEN ''
      |       WHEN event_id % 23 = 0 THEN 'All about Google ' || CAST(event_id % 40 AS VARCHAR)
      |       ELSE 'Title ' || CAST(event_id % 500 AS VARCHAR) END AS Title,
      |  ts AS EventTime,
      |  CAST(ts AS DATE) AS EventDate,
      |  CAST(event_id % 100 AS INTEGER) AS CounterID,
      |  CAST(event_id % 8191 AS INTEGER) AS ClientIP,
      |  CAST(user_id % 10 AS INTEGER) AS RegionID,
      |  user_id AS UserID,
      |  CASE WHEN event_id % 3 = 0 THEN ''
      |       ELSE event_type || ' ' || CAST(event_id % 97 AS VARCHAR) END AS SearchPhrase,
      |  CAST(event_id % 13 AS SMALLINT) AS SearchEngineID,
      |  CAST(event_id % 5 AS SMALLINT) AS AdvEngineID,
      |  CAST(1000 + event_id % 920 AS INTEGER) AS ResolutionWidth,
      |  CASE WHEN event_id % 4 = 0 THEN ''
      |       ELSE 'Phone' || CAST(event_id % 6 AS VARCHAR) END AS MobilePhoneModel,
      |  CAST(event_id % 3 AS SMALLINT) AS MobilePhone,
      |  CASE WHEN event_id % 5 = 0 THEN 'http://google.com/q=' || CAST(event_id % 50 AS VARCHAR)
      |       WHEN event_id % 5 = 1 THEN 'http://example.com/p/' || CAST(event_id % 200 AS VARCHAR)
      |       ELSE 'http://site' || CAST(event_id % 9 AS VARCHAR) || '.org/page/' || CAST(event_id % 300 AS VARCHAR) END AS URL,
      |  CASE WHEN event_id % 6 = 0 THEN ''
      |       ELSE 'http://ref' || CAST(event_id % 7 AS VARCHAR) || '.net/x/' || CAST(event_id % 40 AS VARCHAR) END AS Referer,
      |  CAST(event_id % 2 AS SMALLINT) AS IsRefresh,
      |  CAST(event_id % 17 - 1 AS SMALLINT) AS TraficSourceID,
      |  event_id * 37 % 1000003 AS RefererHash,
      |  event_id * 31 % 1000033 AS URLHash,
      |  CAST(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS SMALLINT) AS IsLink,
      |  CAST(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS SMALLINT) AS IsDownload,
      |  CAST(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS SMALLINT) AS DontCountHits,
      |  CAST(800 + event_id % 640 AS INTEGER) AS WindowClientWidth,
      |  CAST(600 + event_id % 480 AS INTEGER) AS WindowClientHeight
      |FROM events""".stripMargin

  /** Per-query positional fractional-ness of the DuckDB-side output
    * (DuckDB DESCRIBE over the hits view; static because the official
    * texts and the synthesized view are). 'f' = DECIMAL/DOUBLE/FLOAT
    * → 2dp-floor normalization; '.' = exact → native VARCHAR. */
  private val fracMasks: Seq[String] = Seq(
    ".", ".", "..f", "f", ".", ".", "..", "..", "..", "...f.",
    "..", "...", "..", "..", "...", "..", "...", "...", "....", ".",
    ".", "...", ".....", "..........................", ".", ".", ".", ".f.", ".f..",
    "..........................................................................................",
    "....f", "....f", "....f", "..", "...", ".....", "..", "..", "..",
    "......", "...", "...", "..")

  /** 1-based query numbers gated on count only — MEASURED r10
    * (CbFpProbe ↔ tools/cb_fp_oracle.py diff at the sf0.01 gate
    * scale; 33 of 43 hash-match on values): each member's top-level
    * ORDER BY lands its LIMIT cutoff on tied count/frequency keys
    * (top-N SearchPhrase/user cohorts — different engines
    * legitimately keep different rows at the cutoff). */
  private[queries] val countOnly: Set[Int] =
    Set(14, 15, 18, 19, 22, 23, 31, 32, 33, 36)

  private def isCountOnly(i: Int): Boolean = countOnly.contains(i + 1)

  /** DuckDB-side fingerprint subquery (TpcdsFull.oracleFp shape). */
  private def oracleFp(i: Int): String = {
    val mask = fracMasks(i)
    val cols = mask.indices.map(k => s"c$k")
    val norms = mask.zipWithIndex.map { case (ch, k) =>
      if (ch == 'f')
        s"COALESCE(CAST(CAST(floor(CAST(CAST(c$k AS VARCHAR) AS DOUBLE)*100 + 0.5) AS BIGINT) AS VARCHAR), '<null>')"
      else s"COALESCE(CAST(c$k AS VARCHAR), '<null>')"
    }
    // concat_ws, not chained || — a 90-column row (q30) blows DuckDB's
    // 128-deep binder recursion on the chained form
    val row =
      if (norms.length > 1) s"concat_ws('|', ${norms.mkString(", ")})"
      else norms.head
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |COALESCE(md5(string_agg(__r, chr(10) ORDER BY __r)), '<empty>') AS fp FROM
       |(SELECT $row AS __r FROM (
       |${texts(i)}
       |) __t(${cols.mkString(", ")})) __rows""".stripMargin
  }

  private def oracleText: String = {
    val parts = texts.indices.map { i =>
      if (isCountOnly(i))
        s"SELECT ${i + 1} AS qid, CAST((SELECT COUNT(*) FROM (\n${texts(i)}\n) __q${i + 1}) AS BIGINT) AS n, '<count-only>' AS fp"
      else
        s"SELECT ${i + 1} AS qid, n, fp FROM (\n${oracleFp(i)}\n) __f${i + 1}"
    }
    s"WITH hits AS (\n$hitsViewSql\n)\nSELECT * FROM (\n${parts.mkString("\nUNION ALL\n")}\n) ORDER BY qid"
  }

  /** Spark-side fingerprint under the same positional mask —
    * TpcdsFull's renderer (identical normalization contract). */
  def fingerprint(rows: Array[Row], i: Int): String = {
    val mask = fracMasks(i)
    val strs = rows.map { r =>
      require(r.length == mask.length,
        s"cb q${i + 1}: ${r.length} output columns, mask has ${mask.length}")
      mask.indices.map(k => TpcdsFull.renderValue(r.get(k), mask(k) == 'f')).mkString("|")
    }.sorted
    if (strs.isEmpty) "<empty>" else TpcdsFull.md5Hex(strs.mkString("\n"))
  }

  val defs: Seq[QDef] = Seq(
    QDef.sql("cb_full43_sweep", oracleText) { (s, dir) =>
      Catalog.registerAll(s, dir)
      GraftSql.sql(s, hitsViewSql).createOrReplaceTempView("hits")
      val rows = texts.zipWithIndex.map { case (q, i) =>
        if (isCountOnly(i)) Row(i + 1, GraftSql.sql(s, q).count(), "<count-only>")
        else {
          val collected = GraftSql.sql(s, q).collect()
          Row(i + 1, collected.length.toLong, fingerprint(collected, i))
        }
      }
      val schema = StructType(Seq(
        StructField("qid", IntegerType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("fp", StringType, nullable = false)))
      s.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        .orderBy("qid")
    }
  )
}
