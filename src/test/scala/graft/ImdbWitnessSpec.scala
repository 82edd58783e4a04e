package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Imdb, ImdbWitness}

/** ImdbWitness — the JOB domain-alignment solver. The heavy gate is
  * the imdb_job_sweep oracle row (value fingerprints vs DuckDB, and
  * `Probe imdbnulls` measured 113/113 non-NULL at sf0.01); this spec
  * pins the pure construction: solve coverage, join-class key
  * sharing, and satisfying-value selection.
  */
class ImdbWitnessSpec extends AnyFunSuite {

  test("solver admits witness rows for at least 100 of the 113 queries") {
    val solved = Imdb.queries.zipWithIndex.count { case ((_, q), qi) =>
      ImdbWitness.witnessRows(q, qi).isDefined
    }
    assert(solved >= 100, s"witness solver admitted only $solved/113")
  }

  test("join-equal columns share one fresh key; literals satisfied") {
    val q =
      """SELECT MIN(t.title) AS movie_title
        |FROM keyword AS k, movie_keyword AS mk, title AS t
        |WHERE k.keyword LIKE '%sequel%'
        |  AND t.production_year > 2005
        |  AND mk.keyword_id = k.id
        |  AND t.id = mk.movie_id""".stripMargin
    val rows = ImdbWitness.witnessRows(q, 999).get.toMap
    val k = rows("keyword"); val mk = rows("movie_keyword"); val t = rows("title")
    assert(mk("keyword_id") === k("id"), "keyword join key shared")
    assert(mk("movie_id") === t("id"), "movie join key shared")
    assert(k("keyword").asInstanceOf[String].contains("sequel"))
    assert(t("production_year").asInstanceOf[Double] > 2005)
    // fresh keys sit far above every organic id range
    assert(k("id").asInstanceOf[Long] > 1000000000L)
  }

  test("unsatisfiable predicates are vetoed, not emitted") {
    val q =
      """SELECT MIN(t.title) AS x
        |FROM title AS t
        |WHERE t.production_year > 2010 AND t.production_year < 2005""".stripMargin
    assert(ImdbWitness.witnessRows(q, 998).isEmpty)
  }

  test("every witness table appears in the synthesized schema with full columns") {
    ImdbWitness.rowsByTable.foreach { case (table, rows) =>
      val schema = Imdb.tableSchema.getOrElse(table,
        fail(s"witness table $table not in tableSchema"))
      rows.foreach(r => assert(schema.map(_._1).toSet === r.keySet,
        s"row columns mismatch for $table"))
    }
  }
}
