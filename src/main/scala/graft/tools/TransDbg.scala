object TransDbg {
  def main(args: Array[String]): Unit = {
    val texts = Seq(
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
 CAST(unnest(embedding) AS DOUBLE) AS val
FROM embeddings
WHERE vec_id < 20
ORDER BY vec_id, pos""",
      """WITH spans AS (SELECT 1 AS user_id),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM spans)
SELECT * FROM grid""",
      "SELECT 1.0 / 0.0, 7 % 3, a / b FROM t",
      "SELECT * EXCLUDE (n_regionkey) REPLACE (lower(n_name) AS n_name, n_nationkey * 10 AS n_nationkey) FROM nation ORDER BY n_nationkey")
    texts.foreach(t => println("====\n" + graft.plans.DuckDialect.translate(t)))
  }
}
