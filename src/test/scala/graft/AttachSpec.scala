package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Attach, Catalog}

/** ATTACH/DETACH lifecycle: attached tables read identically to
  * direct Catalog reads (including the events nanos-truncation view),
  * cross-database joins resolve, and DETACH removes the whole mount.
  */
class AttachSpec extends AnyFunSuite {
  import TestSession._

  test("attach mounts tables; reads match Catalog; detach unmounts") {
    Attach.attach(spark, "attspec1", sfDir)
    assert(Attach.isAttached(spark, "attspec1"))

    val viaAttach = spark.sql("SELECT COUNT(*) FROM attspec1.orders").collect()(0).getLong(0)
    val direct = Catalog.table(spark, sfDir, "orders").count()
    assert(viaAttach === direct)

    // events view applies the same µs truncation as Catalog.table
    val attTs = spark.sql("SELECT MIN(ts) FROM attspec1.events").collect()(0).getTimestamp(0)
    val dirTs = Catalog.table(spark, sfDir, "events")
      .agg(min(col("ts"))).collect()(0).getTimestamp(0)
    assert(attTs === dirTs)

    Attach.detach(spark, "attspec1")
    assert(!Attach.isAttached(spark, "attspec1"))
    intercept[Exception] { spark.sql("SELECT COUNT(*) FROM attspec1.orders").collect() }
  }

  test("two mounts of the same data cross-join consistently") {
    Attach.attach(spark, "attspec2", sfDir)
    Attach.attach(spark, "attspec3", sfDir)
    val n = spark.sql(
      """SELECT COUNT(*) FROM attspec2.nation a
        |JOIN attspec3.nation b ON a.n_nationkey = b.n_nationkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === Catalog.table(spark, sfDir, "nation").count())
    Attach.detach(spark, "attspec2")
    Attach.detach(spark, "attspec3")
  }
}
