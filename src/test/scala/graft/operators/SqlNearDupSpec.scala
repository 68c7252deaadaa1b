package graft.operators

import graft.SparkSpec

/** Golden gate for the pure-SQL minhash near-dup text: on the same
  * corpus, the SQL form must return EXACTLY the DataFrame operator's
  * pairs (bit-identical jaccard — both run in Spark, same arithmetic). */
class SqlNearDupSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // this suite shadows the shared `documents` view with its fixtures;
  // restore the catalog and the Tables registration cache so suites
  // running after us see real tables, not a fixture
  override def afterAll(): Unit = {
    spark.catalog.dropTempView("documents")
    graft.Tables.invalidateRegistration(spark)
    super.afterAll()
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  private def crossCheck(docs: org.apache.spark.sql.DataFrame,
      maxBucketSize: Int = 1000): Unit = {
    graft.expressions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("documents")
    val sql = pairsOf(spark.sql(NearDup.minhashPairsSql(shingleSize = 2,
      bands = 8, rowsPerBand = 2, threshold = 0.5,
      maxBucketSize = maxBucketSize)))
    val op = pairsOf(NearDup.minhashPairs(docs, "doc_id", "text",
      shingleSize = 2, bands = 8, rowsPerBand = 2, threshold = 0.5,
      maxBucketSize = maxBucketSize))
    assert(sql == op, s"sql=$sql op=$op")
  }

  test("SQL text == DataFrame operator on a planted near-dup corpus") {
    crossCheck(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox leaps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer"),
      (4L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text"))
  }

  test("SQL text == DataFrame operator when the bucket guard fires") {
    val degen = ((1L to 300L).map(i =>
      (i, "all documents carry this very same crawl boilerplate text")) ++
      Seq((901L, "an unrelated document about connected components")))
      .toDF("doc_id", "text")
    crossCheck(degen, maxBucketSize = 50)
  }
}
