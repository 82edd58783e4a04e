package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvSniffer

/** Dialect + type auto-detection against hand-authored files: the
  * sniffer must recover delimiter, header presence, and column types
  * from a bounded sample, and the resulting read must parse values
  * correctly (including quoted fields, which the sample-based
  * consistency check never sees broken because Spark does the real
  * parsing).
  */
class CsvSnifferSpec extends AnyFunSuite {
  import TestSession._

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("sniff")
    Files.write(dir.resolve("part.csv"), lines.mkString("\n").getBytes)
    dir.toString
  }

  test("headerless pipe-delimited file: delimiter + types, c0.. names") {
    val p = write(Seq("1|ALGERIA|0", "2|BRAZIL|1", "3|CANADA|1"))
    val d = CsvSniffer.sniff(spark, p)
    assert(d.delimiter == '|' && !d.header)
    assert(d.schema.fields.map(_.dataType).toSeq ==
      Seq(LongType, StringType, LongType))
    assert(d.schema.fieldNames.toSeq == Seq("c0", "c1", "c2"))
    val rows = CsvSniffer.read(spark, p).collect()
    assert(rows.length == 3 && rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("comma file with header: header detected, names from first row") {
    val p = write(Seq("id,name,score", "1,alpha,1.5", "2,beta,2.25"))
    val d = CsvSniffer.sniff(spark, p)
    assert(d.delimiter == ',' && d.header)
    assert(d.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(d.schema.fields.map(_.dataType).toSeq ==
      Seq(LongType, StringType, DoubleType))
    val rows = CsvSniffer.read(spark, p).orderBy("id").collect()
    assert(rows(1).getDouble(2) == 2.25)
  }

  test("all-string file with a header-looking first row stays headerless") {
    // no column is typed, so the "first row disagrees with the column
    // type" rule never fires — matches the reference's behavior of
    // needing type evidence to declare a header
    val p = write(Seq("name,city", "alice,berlin", "bob,paris"))
    val d = CsvSniffer.sniff(spark, p)
    assert(!d.header)
    assert(d.schema.fields.forall(_.dataType == StringType))
  }

  test("semicolon dialect with dates, empty fields stay null") {
    val p = write(Seq("1;2024-01-31;x", "2;;y", "3;2024-02-01;z"))
    val d = CsvSniffer.sniff(spark, p)
    assert(d.delimiter == ';' && !d.header)
    assert(d.schema.fields(1).dataType == DateType)
    val rows = CsvSniffer.read(spark, p).orderBy("c0").collect()
    assert(rows(1).isNullAt(1))
    assert(rows(0).getDate(1).toString == "2024-01-31")
  }

  test("tab dialect, long→double widening across rows") {
    val p = write(Seq("1\t10", "2\t2.5"))
    val d = CsvSniffer.sniff(spark, p)
    assert(d.delimiter == '\t')
    assert(d.schema.fields(1).dataType == DoubleType)
  }

  test("quoted field containing the delimiter parses correctly") {
    val p = write(Seq("1,\"a,b\",2", "3,\"c,d\",4"))
    val rows = CsvSniffer.read(spark, p).orderBy("c0").collect()
    assert(rows(0).getString(1) == "a,b", rows.mkString(";"))
  }

  test("sample is bounded: sniff of a wide file stops at sampleLines") {
    val lines = (1 to 1000).map(i => s"$i|v$i")
    val p = write(lines)
    val d = CsvSniffer.sniff(spark, p, sampleLines = 10)
    assert(d.delimiter == '|')
    assert(CsvSniffer.read(spark, p, sampleLines = 10).count() == 1000)
  }
}
