package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training stage of an LLM data pipeline.
  *
  * Scale shape: training operates on the WORD HISTOGRAM (distinct
  * word, count), not the corpus — the one corpus-wide pass is a
  * token-count aggregate, after which each merge round is ONE
  * aggregate over the (bounded-vocabulary) histogram: explode
  * adjacent symbol pairs weighted by word count, take the global
  * argmax. The winning pair (a handful of bytes) broadcasts back as
  * a literal in a map-only rewrite. No row ever carries more than
  * one word, and nothing is quadratic: round cost is
  * O(vocab · word-length).
  *
  * Determinism: ties on pair frequency break lexicographically, so
  * the learned merge table is reproducible at any cluster size.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Word histogram: one corpus pass. Words are lowercased
    * whitespace tokens.
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Space-separate every character: "low" → "l o w". The symbol
    * string is the working representation; merges fuse adjacent
    * symbols by deleting the space between them.
    */
  private def charSeparated(word: Column): Column =
    array_join(transform(
      sequence(lit(1), length(word)), i => word.substr(i, lit(1))), " ")

  /** Learn `nMerges` merges from the histogram. Each round:
    * (1) one aggregate — adjacent-pair frequencies over the symbol
    * strings, weighted by word count; (2) the argmax pair rewrites
    * the histogram map-only via a boundary-anchored regex (zero-width
    * lookarounds, so consecutive pairs all merge in one pass, the
    * left-to-right greedy order BPE specifies). The histogram is
    * checkpointed per round to keep lineage flat.
    */
  def train(hist: DataFrame, nMerges: Int): Seq[Merge] = {
    var h = hist.select(charSeparated(col("word")).as("sym"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val s = split(col("sym"), " ")
      // single-symbol words carry no pairs: filter, don't special-case
      val best = h.where(size(s) >= 2)
        .select(explode(transform(sequence(lit(1), size(s) - 1),
            i => struct(element_at(s, i).as("l"), element_at(s, i + 1).as("r"))))
          .as("p"), col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, f)
        val q = java.util.regex.Pattern.quote _
        val pat = s"(?<=^|\\s)${q(l)} ${q(r)}(?=\\s|$$)"
        // quoteReplacement: $ and \ are special in the REPLACEMENT too
        h = h.select(
            regexp_replace(col("sym"), pat,
              java.util.regex.Matcher.quoteReplacement(l + r)).as("sym"),
            col("cnt"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize a WORD column with a learned merge table — a pure
    * projection: the merge list rides into the plan as literals
    * applied in rank order, exactly the greedy application order of
    * training. (Whole documents tokenize as explode(words) →
    * tokenize(word) — BPE merges never cross word boundaries.)
    */
  def tokenize(word: Column, merges: Seq[Merge]): Column = {
    val q = java.util.regex.Pattern.quote _
    val sym = merges.foldLeft(charSeparated(word)) { (acc, m) =>
      regexp_replace(acc,
        s"(?<=^|\\s)${q(m.left)} ${q(m.right)}(?=\\s|$$)",
        java.util.regex.Matcher.quoteReplacement(m.left + m.right))
    }
    split(sym, " ")
  }

  /** Merge table as a DataFrame for persistence/inspection. */
  def mergesFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
