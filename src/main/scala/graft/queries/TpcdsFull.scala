package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.GraftSql

/** The COMPLETE official TPC-DS suite — all 99 query texts from the
  * reference's tpcds extension
  * (/root/reference/extension/tpcds/dsdgen/queries/01.sql–99.sql),
  * read at runtime and executed VERBATIM through the dialect front
  * door against the synthesized 24-table schema (TpcdsGen) — the
  * cb_full43_sweep treatment applied to the last benchmark tree the
  * repo had not run verbatim.
  *
  * The 20 value-hashed DS shapes (Tpcds.scala) check plan-class
  * VALUES; this sweep closes suite BREADTH: every official text must
  * parse, plan, and execute, and its row count must match DuckDB
  * running the same text over the same views (ORDER BY under LIMIT
  * is tie-ambiguous across engines, so counts are the strongest
  * whole-suite invariant — the ClickBench43 precedent). TpcdsGen's
  * hot-pool/witness design makes all 99 return non-trivial rows —
  * at this volume the reference's own sf0.01 answer set leaves 16
  * of them empty.
  */
object TpcdsFull {

  private val queriesDir = "/root/reference/extension/tpcds/dsdgen/queries"

  lazy val texts: Seq[String] =
    (1 to 99).map { i =>
      val p = java.nio.file.Paths.get(f"$queriesDir/$i%02d.sql")
      new String(java.nio.file.Files.readAllBytes(p)).trim.stripSuffix(";")
    }

  private def oracleText: String = {
    val parts = texts.zipWithIndex.map { case (q, i) =>
      s"SELECT ${i + 1} AS qid, CAST((SELECT COUNT(*) FROM (\n$q\n) __q${i + 1}) AS BIGINT) AS n"
    }
    s"${TpcdsGen.oraclePrelude}\nSELECT * FROM (\n${parts.mkString("\nUNION ALL\n")}\n) ORDER BY qid"
  }

  val defs: Seq[QDef] = Seq(
    QDef.sql("tpcds_full99_sweep", oracleText) { (s, _) =>
      TpcdsGen.register(s)
      val rows = texts.zipWithIndex.map { case (q, i) =>
        Row(i + 1, GraftSql.sql(s, q).count())
      }
      val schema = StructType(Seq(
        StructField("qid", IntegerType, nullable = false),
        StructField("n", LongType, nullable = false)))
      s.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        .orderBy("qid")
    }
  )
}
