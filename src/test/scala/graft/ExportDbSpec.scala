package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, ExportDb}

/** EXPORT/IMPORT DATABASE contracts: artifact layout (per-table
  * parquet + schema.sql + load.sql), reference type names in the DDL,
  * value fidelity through the round-trip, and laziness of import.
  */
class ExportDbSpec extends AnyFunSuite {
  import TestSession._

  test("export emits parquet + schema.sql + load.sql; import round-trips values") {
    val dir = Files.createTempDirectory("graft_exp_spec").toString
    val nation = Catalog.table(spark, sfDir, "nation")
    val region = Catalog.table(spark, sfDir, "region")
    ExportDb.exportDatabase(Map("t_nation" -> nation, "t_region" -> region), dir)

    val schema = ExportDb.schemaSql(dir)
    assert(schema.contains("CREATE TABLE t_nation ("))
    assert(schema.contains("n_name VARCHAR"))
    assert(schema.contains("n_nationkey INTEGER"))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "load.sql"))).contains("FORMAT PARQUET"))

    val imported = ExportDb.importDatabase(spark, dir)
    assert(imported.keySet == Set("t_nation", "t_region"))
    // value fidelity: imported rows == originals, by full outer compare
    assert(imported("t_nation").exceptAll(nation).isEmpty)
    assert(nation.exceptAll(imported("t_nation")).isEmpty)
    // imported names are live temp views
    assert(spark.sql("SELECT count(*) FROM t_region").head().getLong(0)
      == region.count())
  }
}
