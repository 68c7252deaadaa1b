package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the pure-SQL sampling statement (q126) bit-identical to the
  * operator composition it declares: deterministicSample(0.5) →
  * assignSplits(0.8/0.1/0.1) → stratifiedSample(en→0.25, else keep).
  * The SQL string itself is shared with the DuckDB oracle, so this spec
  * closes the remaining gap: SQL == operators == oracle. */
class SqlSamplingSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // this suite shadows the shared `documents` view with its fixture;
  // restore the catalog and the Tables registration cache so suites
  // running after us see real tables, not the fixture
  override def afterAll(): Unit = {
    spark.catalog.dropTempView("documents")
    graft.Tables.invalidateRegistration(spark)
    super.afterAll()
  }

  test("q126 SQL equals the operator composition row for row") {
    val docs = (1L to 4000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    docs.createOrReplaceTempView("documents")
    val sql = graft.queries.ExtQueries.queries("q126_sql_sampling")
    // rebuild the same statement against this corpus via the public map
    // (the query registers real tables; here the temp view shadows it)
    val viaSql = spark.sql(
      graft.queries.ExtQueries.oracles("q126_sql_sampling"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSet

    val sampled = Sampling.deterministicSample(docs, "doc_id", 0.5)
    val split = Sampling.assignSplits(sampled, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val stratIds = Sampling.stratifiedSample(split, "lang", "doc_id",
        Map("en" -> 0.25), defaultFraction = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaOps = split.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        stratIds.contains(r.getLong(0)))).toSet
    assert(viaSql == viaOps)
    // the strat flag genuinely thins only the en stratum. Note the
    // composition semantics the family inherits from sharing ONE bucket
    // per key: the 0.25 stratified threshold NESTS inside the 0.5 sample
    // (smaller threshold wins), so the conditional keep rate among
    // sampled rows is 0.25/0.5 = 0.5 — thresholds compose by min, not by
    // product (decorrelating needs a salted key, as upsample's "#u").
    val en = viaSql.filter(_._2 == "en")
    val enKept = en.count(_._4)
    assert(enKept > en.size * 0.40 && enKept < en.size * 0.60)
    assert(viaSql.filter(_._2 == "de").forall(_._4))
    assert(sql != null)
  }
}
