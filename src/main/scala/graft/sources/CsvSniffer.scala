package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV dialect + type auto-detection — the reference's sniffer surface
  * (/root/reference/src/function/table/sniff_csv.cpp drives
  * read_csv auto-detection: delimiter, header, per-column types from a
  * bounded sample), rebuilt for Spark's CSV reader.
  *
  * Spark's own reader needs the dialect handed to it and its
  * `inferSchema` option runs a FULL extra pass over the data; at
  * 100 TB both are unacceptable. This sniffer reads only a bounded
  * line sample through `spark.read.text(...).limit(n)` — the scan
  * short-circuits after the first file's first block — decides
  * (delimiter, header, schema) driver-side, and hands the reader an
  * EXPLICIT schema, so the actual CSV scan is single-pass and fully
  * distributed.
  *
  * Detection, matching the reference's behavior:
  *  - delimiter: the candidate (`,` `|` `;` TAB) splitting every
  *    sampled line into the same count of >1 fields; ties prefer more
  *    fields.
  *  - header: present iff some column's data rows are typed (numeric/
  *    date) while the first row's field is not — the reference's
  *    "first row disagrees with the column type" rule.
  *  - types per column, narrowest that parses every non-empty sample
  *    field: BIGINT → DOUBLE → DATE → TIMESTAMP → BOOLEAN → STRING.
  *
  * Quoted-field caveat (documented, like the reference's sample_size
  * one): a delimiter INSIDE a quoted sample field can skew the
  * consistency count; the reader itself still parses quotes correctly
  * since parsing is Spark's, not ours.
  */
object CsvSniffer {

  final case class Dialect(delimiter: Char, header: Boolean, schema: StructType)

  private val Candidates = Seq(',', '|', ';', '\t')

  private val LongRe = "[+-]?\\d{1,19}".r
  private val DoubleRe = "[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?".r
  private val DateRe = "\\d{4}-\\d{2}-\\d{2}".r
  private val TsRe = "\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?".r
  private val BoolRe = "(?i)(true|false)".r

  private def fullMatch(r: scala.util.matching.Regex, s: String): Boolean =
    r.pattern.matcher(s).matches()

  /** Narrowest type for one field; None for empty (null) fields. */
  private def fieldType(s: String): Option[DataType] = {
    val t = s.trim
    if (t.isEmpty) None
    else if (fullMatch(LongRe, t)) Some(LongType)
    else if (fullMatch(DoubleRe, t)) Some(DoubleType)
    else if (fullMatch(DateRe, t)) Some(DateType)
    else if (fullMatch(TsRe, t)) Some(TimestampType)
    else if (fullMatch(BoolRe, t)) Some(BooleanType)
    else Some(StringType)
  }

  /** Widen two observed types to the narrowest common one. */
  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType
  }

  /** Sniff dialect + schema from the first `sampleLines` lines. The
    * sample is a driver-side bounded collect — like the reference's
    * sample_size, never a full pass.
    */
  def sniff(spark: SparkSession, path: String, sampleLines: Int = 100): Dialect = {
    val lines = spark.read.text(path).limit(sampleLines)
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    require(lines.nonEmpty, s"cannot sniff an empty CSV at $path")

    def split(line: String, d: Char): Array[String] =
      line.split(java.util.regex.Pattern.quote(d.toString), -1)

    // dialect: every line must agree on a >1 field count
    val delim = Candidates
      .map { d => (d, split(lines.head, d).length) }
      .filter { case (d, n) => n > 1 && lines.forall(split(_, d).length == n) }
      .sortBy { case (_, n) => -n }
      .headOption.map(_._1)
      .getOrElse(',') // single-column file: any delimiter reads it whole

    val rows = lines.map(split(_, delim))
    val nCols = rows.head.length

    def colTypes(rs: Array[Array[String]], c: Int): DataType =
      rs.flatMap(r => fieldType(r(c))).reduceOption(widen).getOrElse(StringType)

    // header iff some column is typed over the data rows but the first
    // row's field does not parse as that type
    val header = rows.length > 1 && (0 until nCols).exists { c =>
      val dataT = colTypes(rows.tail, c)
      dataT != StringType &&
        fieldType(rows.head(c)).exists(ft => widen(ft, dataT) == StringType)
    }

    val dataRows = if (header) rows.tail else rows
    val names =
      if (header) rows.head.map(_.trim)
      else (0 until nCols).map(i => s"c$i").toArray
    val fields = (0 until nCols).map { c =>
      StructField(names(c), if (dataRows.isEmpty) StringType else colTypes(dataRows, c),
        nullable = true)
    }
    Dialect(delim, header, StructType(fields))
  }

  /** Read a CSV with auto-detected dialect and schema — the
    * reference's `read_csv(path)` with no options. One bounded sample
    * plus ONE distributed scan with an explicit schema (no
    * inferSchema second pass).
    */
  def read(spark: SparkSession, path: String, sampleLines: Int = 100): DataFrame = {
    val d = sniff(spark, path, sampleLines)
    spark.read
      .schema(d.schema)
      .option("sep", d.delimiter.toString)
      .option("header", d.header.toString)
      .option("timestampFormat", "yyyy-MM-dd[ ]['T']HH:mm:ss[.SSSSSS]")
      .csv(path)
  }
}
