package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base3 =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")

  test("merge: update + insert + delete in one statement") {
    val changes = Seq(
      (2L, "b2", 22.0, false), // update
      (4L, "d", 40.0, false),  // insert
      (3L, "c", 30.0, true)    // delete
    ).toDF("k", "name", "bal", "is_delete")
    val out = Cdc.merge(base3, changes, Seq("k"), Some("is_delete"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))
  }

  test("merge: deleting an absent key is a no-op; null delete flag is keep") {
    val changes = Seq((99L, "x", 0.0, Some(true)), (4L, "d", 40.0, None))
      .toDF("k", "name", "bal", "is_delete")
    val out = Cdc.merge(base3, changes, Seq("k"), Some("is_delete"))
    assert(out.count() == 4)
    assert(out.filter($"k" === 99L).count() == 0)
  }

  test("merge: schema mismatch fails loudly") {
    val changes = Seq((2L, "b2")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Cdc.merge(base3, changes, Seq("k"))
    }
  }

  test("mergeIntoVersioned: snapshot commit + time travel + cardinality") {
    val table = Files.createTempDirectory("graft_cdc_vt_").toString + "/t"
    VersionedTable.write(base3, table)
    val changes = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("k", "name", "bal")
    val v2 = Cdc.mergeIntoVersioned(spark, table, changes, Seq("k"))
    assert(v2 == 2L)
    // new version merged, old version untouched (snapshot isolation)
    assert(VersionedTable.read(spark, table).count() == 4)
    assert(VersionedTable.read(spark, table, Some(1L)).count() == 3)
    // MERGE cardinality violation: two change rows for one key
    val dup = Seq((5L, "e", 1.0), (5L, "e2", 2.0)).toDF("k", "name", "bal")
    intercept[IllegalArgumentException] {
      Cdc.mergeIntoVersioned(spark, table, dup, Seq("k"))
    }
  }

  test("mergePartitioned rewrites ONLY touched partitions") {
    val root = Files.createTempDirectory("graft_cdc_wh_").toString
    val wh = Warehouse(root)
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
      (3L, "2024-01-03", 3.0)).toDF("k", "day", "v")
    Medallion.writeTable(df, wh, Medallion.Silver, "t",
      partitionBy = Seq("day"))
    def filesOf(day: String): Set[String] = {
      val d = Paths.get(wh.table(Medallion.Silver, "t"), s"day=$day")
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
    val before01 = filesOf("2024-01-01")
    val before02 = filesOf("2024-01-02")
    // change day 2 only: update k=2, insert k=20 in the same partition
    val changes = Seq((2L, "2024-01-02", 22.0, false),
      (20L, "2024-01-02", 20.0, false)).toDF("k", "day", "v", "is_delete")
    Cdc.mergePartitioned(spark, wh, Medallion.Silver, "t", "day", changes,
      Seq("k"), Some("is_delete"))
    // untouched partition keeps its exact files; touched one was rewritten
    assert(filesOf("2024-01-01") == before01)
    assert(filesOf("2024-01-02") != before02)
    val after = Medallion.readTable(spark, wh, Medallion.Silver, "t")
    assert(after.count() == 4)
    assert(after.filter($"k" === 2L).select("v").as[Double].head() == 22.0)
  }

  test("mergePartitioned removes a partition whose rows were all deleted") {
    val root = Files.createTempDirectory("graft_cdc_del_").toString
    val wh = Warehouse(root)
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      .toDF("k", "day", "v")
    Medallion.writeTable(df, wh, Medallion.Silver, "t",
      partitionBy = Seq("day"))
    // delete the only row of day 2: dynamic overwrite alone would leave
    // the stale directory in place
    val changes = Seq((2L, "2024-01-02", 2.0, true))
      .toDF("k", "day", "v", "is_delete")
    Cdc.mergePartitioned(spark, wh, Medallion.Silver, "t", "day", changes,
      Seq("k"), Some("is_delete"))
    assert(!Files.isDirectory(
      Paths.get(wh.table(Medallion.Silver, "t"), "day=2024-01-02")))
    val after = Medallion.readTable(spark, wh, Medallion.Silver, "t")
    assert(after.count() == 1)
    assert(after.select("k").as[Long].head() == 1L)
  }

  test("mergePartitioned enforces cardinality and detects key migration") {
    val root = Files.createTempDirectory("graft_cdc_grd_").toString
    val wh = Warehouse(root)
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      .toDF("k", "day", "v")
    Medallion.writeTable(df, wh, Medallion.Silver, "t",
      partitionBy = Seq("day"))
    // duplicate change keys: the same MERGE cardinality error the
    // versioned write path throws
    val dup = Seq((1L, "2024-01-01", 5.0), (1L, "2024-01-01", 6.0))
      .toDF("k", "day", "v")
    intercept[IllegalArgumentException] {
      Cdc.mergePartitioned(spark, wh, Medallion.Silver, "t", "day", dup,
        Seq("k"))
    }
    // key 2 lives in day=2024-01-02 but the change row claims day 1:
    // unchecked this would leave a stale duplicate in the old partition
    val migrating = Seq((2L, "2024-01-01", 9.0)).toDF("k", "day", "v")
    val e = intercept[IllegalArgumentException] {
      Cdc.mergePartitioned(spark, wh, Medallion.Silver, "t", "day",
        migrating, Seq("k"), checkKeyMigration = true)
    }
    assert(e.getMessage.contains("migration"))
    // table untouched by the failed merges
    assert(Medallion.readTable(spark, wh, Medallion.Silver, "t")
      .count() == 2)
  }

  test("scd2: collapses no-op updates and builds intervals") {
    val log = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"), // no-op update collapses
      (1L, 3L, 30L, "B"), (1L, 4L, 40L, "A"), // back to A = new interval
      (2L, 5L, 15L, "X")
    ).toDF("user_id", "event_id", "ots", "state")
    val out = Cdc.scd2(log, Seq("user_id"), "ots", "event_id", Seq("state"))
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("scd2 plan: one exchange feeds both window passes") {
    val log = Seq((1L, 1L, 10L, "A")).toDF("user_id", "event_id", "ots", "s")
    val plan = Cdc.scd2(log, Seq("user_id"), "ots", "event_id", Seq("s"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).size
    assert(exchanges == 1, s"expected a single key exchange, plan:\n$plan")
  }

  test("snapshotDiff: insert/update/delete classification, unchanged omitted") {
    val oldSnap = base3
    val newSnap = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "update"), (3L, "delete"), (4L, "insert")))
  }

  test("versionDiff reads two retained snapshots") {
    val table = Files.createTempDirectory("graft_cdc_vd_").toString + "/t"
    VersionedTable.write(base3, table)
    VersionedTable.write(
      Seq((1L, "a", 10.0), (3L, "c", 33.0)).toDF("k", "name", "bal"), table)
    val out = Cdc.versionDiff(spark, table, 1L, 2L, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "delete"), (3L, "update")))
  }
}
