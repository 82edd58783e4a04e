package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE INDEX statement (sources/Indexing): the bucketed-layout
  * analog of the reference's ART index. The proof obligation is real
  * file pruning — a point lookup on the indexed column must open ONE
  * bucket (`SelectedBucketsCount: 1 out of N` in the scan), and the
  * data must survive the rewrite byte-for-byte.
  */
class IndexingSpec extends AnyFunSuite {
  import TestSession._

  private def inScratchDb[T](body: => T): T = {
    spark.sql("CREATE DATABASE IF NOT EXISTS idxspec")
    spark.sql("USE idxspec")
    Seq("pts", "pts__idx_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // clear orphaned locations left by other JVMs (shared warehouse,
    // per-JVM metastore)
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "idxspec.db")
    if (wh.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(wh)
    }
    try body
    finally {
      Seq("pts", "pts__idx_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql("USE default")
    }
  }

  test("point lookup after CREATE INDEX prunes to one bucket") {
    inScratchDb {
      spark.range(10000)
        .selectExpr("CAST(id AS INT) AS k", "CAST(id % 97 AS INT) AS v")
        .write.saveAsTable("pts")
      val before = spark.table("pts").orderBy("k").collect().toSeq
      GraftSql.sql(spark, "CREATE INDEX pts_k ON pts (k)")
      val after = spark.table("pts").orderBy("k").collect().toSeq
      assert(after === before) // rewrite loses nothing
      val q = spark.sql("SELECT v FROM pts WHERE k = 4242")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of"),
        s"expected bucket pruning in plan:\n$plan")
      assert(q.collect().map(_.getInt(0)).toSeq === Seq(4242 % 97))
      assert(graft.plans.TableMeta.indexOn("pts").map(_._2) === Some(Seq("k")))
      GraftSql.sql(spark, "DROP INDEX pts_k")
      assert(graft.plans.TableMeta.indexOn("pts").isEmpty)
    }
  }

  test("CREATE UNIQUE INDEX enforces at build, like the ART constraint check") {
    inScratchDb {
      spark.range(100).selectExpr("CAST(id % 7 AS INT) AS k").write.saveAsTable("pts")
      val e = intercept[Exception] {
        GraftSql.sql(spark, "CREATE UNIQUE INDEX pts_u ON pts (k)")
      }
      assert(e.getMessage.contains("duplicate"))
    }
  }
}
