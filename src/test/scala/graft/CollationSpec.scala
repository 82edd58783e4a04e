package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locale collation matrix (R64): Spark's ICU collations must order a
  * discriminating word list exactly as the oracle's ICU build does.
  * Expected sequences below are VERBATIM DuckDB 1.0.0 output for
  * `ORDER BY w COLLATE "<loc>"` over the same list (captured
  * 2026-08-14), so a drift on either side fails the pin. Each list is
  * chosen so the locale's tailoring — not just case or accent
  * stripping — decides the order: de ranks ä/ö with a/o, tr puts
  * dotless ı BEFORE i, sv puts å/ö AFTER z, zh ranks CJK by pinyin
  * (which disagrees with code-point order on these very characters).
  */
class CollationSpec extends AnyFunSuite {
  import TestSession._

  private val words = Seq("zebra", "apple", "ångström", "örebro", "ara",
    "ozon", "ilik", "ırmak", "中文", "国文", "文中")

  private val expected = Map(
    "de" -> Seq("ångström", "apple", "ara", "ilik", "ırmak", "örebro",
      "ozon", "zebra", "中文", "国文", "文中"),
    "tr" -> Seq("ångström", "apple", "ara", "ırmak", "ilik", "ozon",
      "örebro", "zebra", "中文", "国文", "文中"),
    "sv" -> Seq("apple", "ara", "ilik", "ırmak", "ozon", "zebra",
      "ångström", "örebro", "中文", "国文", "文中"),
    "zh" -> Seq("国文", "文中", "中文", "ångström", "apple", "ara",
      "ilik", "ırmak", "örebro", "ozon", "zebra"))

  for ((loc, want) <- expected.toSeq.sortBy(_._1)) {
    test(s"locale '$loc' ordering matches the oracle's ICU tailoring") {
      import spark.implicits._
      val got = words.toDF("w")
        .orderBy(collate(col("w"), loc))
        .collect().map(_.getString(0)).toSeq
      assert(got == want, s"$loc: got $got")
    }
  }

  test("the locales genuinely disagree (the matrix is discriminating)") {
    assert(expected.values.toSet.size == 4)
  }
}
