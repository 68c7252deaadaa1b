package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.VersionedTable

/** The DSv2 TableCatalog face of [[GraftProcedureCatalog]]: native SQL
  * time travel (`VERSION AS OF` / `TIMESTAMP AS OF`) over VersionedTable
  * roots, plain-parquet serving, and the read-only refusals — alongside
  * the CALL surface on the same catalog name. */
class GraftTableCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(w: String): String = {
    val name = s"gtt${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftProcedureCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", w)
    name
  }

  test("VERSION AS OF, TIMESTAMP AS OF, latest, and rollback redirects " +
      "resolve through plain multipart SQL") {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    val table = s"$w/wh/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table)
    Thread.sleep(10)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(10)
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), table)
    val cat = freshCatalog(w)

    assert(spark.sql(s"SELECT k FROM $cat.wh.t").count() == 3)
    assert(spark.sql(s"SELECT k FROM $cat.wh.t VERSION AS OF 1")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // TIMESTAMP AS OF between the two commits resolves v1 (session UTC)
    val tsLit = java.time.Instant.ofEpochMilli(betweenMs).toString
      .replace("T", " ").stripSuffix("Z")
    assert(spark.sql(
      s"SELECT k FROM $cat.wh.t TIMESTAMP AS OF '$tsLit'").count() == 2)
    // rollback commits a redirect manifest; the catalog must follow it
    VersionedTable.rollback(table, 1L)
    assert(spark.sql(s"SELECT k FROM $cat.wh.t").count() == 2)
    assert(spark.sql(s"SELECT k FROM $cat.wh.t VERSION AS OF 3")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a timestamp before the first commit has no snapshot to serve
    val e = intercept[Exception] {
      spark.sql(s"SELECT k FROM $cat.wh.t TIMESTAMP AS OF '2001-01-01'")
        .collect()
    }
    assert(e.getMessage.contains("predates"))
  }

  test("plain parquet dirs (flat and Hive-partitioned) serve through " +
      "the catalog; VERSION AS OF on them refuses") {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$w/flat")
    (1 to 2).foreach(d => Seq((d.toLong, s"p$d")).toDF("k", "v")
      .write.parquet(s"$w/part/day=$d"))
    val cat = freshCatalog(w)
    assert(spark.sql(s"SELECT v FROM $cat.flat").collect()
      .map(_.getString(0)).toSeq == Seq("x"))
    // partition pruning works on the catalog-served relation too
    assert(spark.sql(s"SELECT v FROM $cat.part WHERE day = 2").collect()
      .map(_.getString(0)).toSeq == Seq("p2"))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.flat VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("not a versioned table"))
    // missing tables raise the standard analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.nope").collect()
    }
  }

  test("listTables, tableExists, read-only refusals, and the CALL " +
      "surface coexist on one catalog name") {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$w/ns/a")
    Seq((2L, "y")).toDF("k", "v").write.parquet(s"$w/ns/b")
    val cat = freshCatalog(w)
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
    val e = intercept[Exception] {
      spark.sql(s"DROP TABLE $cat.ns.a")
    }
    assert(e.getMessage.contains("read catalog"))
    // procedures keep working with a warehouse configured
    val rep = spark.sql(
      s"CALL $cat.system.remove_orphan_files(table => '$w/ns/a')").collect()
    assert(rep.head.getBoolean(2))
  }
}
