package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift guard (r6 verdict item 3).
  *
  * The driver regenerates /root/testdata between rounds; a silent type flip
  * there (r6: events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) once zeroed a
  * third of the query catalog. This spec pins the post-`Tables.load` schema
  * of every shared table — names AND types — so any future drift fails here
  * first, with a message naming the table, column, and both types.
  *
  * Expectations describe the schema AFTER `Tables.load` normalization, so
  * `events.ts` is always TimestampType regardless of the fixture's physical
  * parquet type (that tolerance is exactly what `normalizeEventTs` provides).
  */
class TableSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  test("Tables.all covers exactly the expected table set") {
    assert(Tables.all.toSet == expected.keySet)
  }

  for (name <- Tables.all) test(s"table '$name' matches pinned schema") {
    val schema = Tables.load(spark, dir, name).schema
    val actual = schema.fields.map(f =>
      f.name -> (f.dataType match {
        // TIMESTAMP_NTZ vs TIMESTAMP (ltz) both acceptable: the fixtures are
        // written without timezone and all query code treats them as UTC.
        case TimestampNTZType => TimestampType
        case ArrayType(et, _) => ArrayType(et)
        case dt => dt
      })).toSeq
    val exp = expected(name)
    val diffs =
      exp.filterNot(actual.contains).map { case (c, t) =>
        s"expected $c: ${t.simpleString}, got ${actual.toMap.get(c).map(_.simpleString).getOrElse("<missing>")}"
      } ++
      actual.filterNot { case (c, _) => exp.exists(_._1 == c) }
        .map { case (c, t) => s"unexpected column $c: ${t.simpleString}" }
    assert(diffs.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT in '$name' — the driver likely regenerated " +
      s"/root/testdata with different types. Update Tables.load normalization " +
      s"or this pin:\n  ${diffs.mkString("\n  ")}")
  }

  test("registerAll isolates a broken table to its own views") {
    // Plant a bad-table scenario: a directory where one table's file is
    // unreadable garbage and the rest are real. Only the bad table's view
    // should be missing; every other view must be queryable.
    val tmp = java.nio.file.Files.createTempDirectory("graft_badtbl_").toFile
    for (n <- Tables.all if n != "events") {
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(tmp, s"$n.parquet").toPath,
        new java.io.File(dir, s"$n.parquet").toPath)
    }
    java.nio.file.Files.write(
      new java.io.File(tmp, "events.parquet").toPath,
      "not a parquet file".getBytes)
    val failed = Tables.registerAll(spark, tmp.toString)
    assert(failed == Seq("events"), s"expected only events to fail, got $failed")
    // Unrelated query still runs:
    assert(spark.sql("SELECT count(*) AS n FROM nation").rows.head.getLong(0) > 0)
    // The broken table's query fails with an error naming the view:
    val err = intercept[Exception](spark.sql("SELECT * FROM events").collect())
    assert(err.getMessage.contains("events"))
    // Restore the real views for any suite running after us.
    Tables.registerAll(spark, dir)
  }
}
