package graft.tools

/** Dump the imdb_job_sweep result + its oracle SQL for a targeted
  * oracle re-check without a full Verify run.
  */
object ImdbDump {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val out = a.lift(1).getOrElse("/tmp/imdbdump")
    val spark = graft.GraftSession.get()
    val d = graft.queries.Imdb.defs.head
    d.run(spark, sfDir).write.mode("overwrite").parquet(s"$out/imdb_job_sweep")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      ("{\"imdb_job_sweep\": " +
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .writeValueAsString(d.oracle.get) + "}").getBytes)
    spark.stop()
  }
}
