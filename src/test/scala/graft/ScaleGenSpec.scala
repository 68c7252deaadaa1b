package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Pins the construction claims the SCALING.md linearity table rests on:
  * an N× [[ScaleGen]] corpus must be N disjoint copies with per-copy
  * statistics IDENTICAL to the source — if any claim here broke, the
  * measured wall-time ratios would be data artifacts, not operator
  * evidence. Generated once at sf0.001 × 3 (18k lineitem rows) and
  * shared across the tests.
  */
class ScaleGenSpec extends SparkSpec {

  private val copies = 3
  private val srcDir = "/root/testdata/sf0.001"
  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sgen_").toString
    ScaleGen.generate(spark, srcDir, d, copies)
    d
  }
  private def src(t: String): DataFrame =
    spark.read.parquet(s"$srcDir/$t.parquet")
  private def out(t: String): DataFrame =
    spark.read.parquet(s"$outDir/$t.parquet")

  private val stopwords = TextFunctions.langProfiles.flatMap(_._2)

  test("fact tables carry exactly N copies; dims are copied verbatim") {
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach { t =>
        assert(out(t).count() === src(t).count() * copies, t)
      }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(out(t).count() === src(t).count(), t)
    }
  }

  test("key spaces are disjoint across copies (distinct counts scale N x)") {
    def dc(df: DataFrame, c: String): Long =
      df.agg(countDistinct(col(c))).head().getLong(0)
    assert(dc(out("lineitem"), "l_orderkey") ===
      dc(src("lineitem"), "l_orderkey") * copies)
    assert(dc(out("documents"), "doc_id") ===
      dc(src("documents"), "doc_id") * copies)
    assert(dc(out("embeddings"), "vec_id") ===
      dc(src("embeddings"), "vec_id") * copies)
    assert(dc(out("events"), "user_id") ===
      dc(src("events"), "user_id") * copies)
  }

  test("lineitem-orders join cardinality scales exactly N x " +
      "(shared orderkey offset keeps the copies aligned)") {
    def joined(li: DataFrame, ord: DataFrame): Long =
      li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined(out("lineitem"), out("orders")) ===
      joined(src("lineitem"), src("orders")) * copies)
  }

  test("per-copy group statistics are identical: the orders-per-customer " +
      "group-size histogram triples bucket by bucket") {
    def hist(df: DataFrame): Map[Long, Long] =
      df.groupBy(col("o_custkey")).count()
        .groupBy(col("count").as("sz")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = hist(src("orders"))
    val o = hist(out("orders"))
    assert(o.keySet === s.keySet)
    s.foreach { case (sz, n) => assert(o(sz) === n * copies, s"bucket $sz") }
  }

  test("language-id and quality score are preserved EXACTLY on every " +
      "tagged copy (profile stopwords untouched, token/uniq/stop counts " +
      "unchanged by the copy suffix)") {
    val base = src("documents").agg(max(col("doc_id"))).head().getLong(0) + 1
    def scored(df: DataFrame) = df.select(
      col("doc_id"),
      TextFunctions.languageId(col("text")).as("lang"),
      TextFunctions.qualityScore(col("text"), stopwords).as("q"))
    val s = scored(src("documents"))
      .withColumnRenamed("lang", "s_lang").withColumnRenamed("q", "s_q")
    val mismatches = scored(out("documents"))
      .withColumn("src_id", col("doc_id") % base)
      .join(s.withColumnRenamed("doc_id", "src_id"), "src_id")
      .filter(col("lang") =!= col("s_lang") || col("q") =!= col("s_q"))
      .count()
    assert(mismatches === 0L)
  }

  test("non-stopword token vocabularies are pairwise DISJOINT across " +
      "copies, so word shingles cannot collide cross-copy") {
    val base = src("documents").agg(max(col("doc_id"))).head().getLong(0) + 1
    val toks = out("documents")
      .select((col("doc_id") / base).cast("int").as("copy"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(!col("tok").isin(stopwords: _*) && col("tok") =!= "")
      .distinct()
    val shared = toks.groupBy(col("tok"))
      .agg(countDistinct(col("copy")).as("ncopies"))
      .filter(col("ncopies") > 1).count()
    assert(shared === 0L)
  }

  test("no exact cross-copy text duplicates beyond stopword-only docs " +
      "(distinct text count scales N x minus the invariant texts)") {
    // a doc whose every token is a profile word is unchanged by tagging
    // and IS an exact cross-copy duplicate — ScaleGen's documented residue.
    // Count distinct invariant TEXTS, not rows: two source rows sharing
    // the same stopword-only text collapse to ONE distinct text, and the
    // formula below subtracts per distinct text, not per row.
    val invariant = src("documents")
      .select(col("text"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(forall(col("toks"), t => t.isin(stopwords: _*) || t === ""))
      .select("text").distinct().count()
    val sDistinct = src("documents").select("text").distinct().count()
    val oDistinct = out("documents").select("text").distinct().count()
    assert(oDistinct === sDistinct * copies - invariant * (copies - 1))
  }

  test("embeddings: element 0 shifted by k*1e-4, every other element " +
      "bit-identical — nothing is an exact duplicate, geometry unmoved") {
    val base = src("embeddings").agg(max(col("vec_id"))).head().getLong(0) + 1
    val s = src("embeddings")
      .select(col("vec_id").as("src_id"), col("embedding").as("s_emb"))
    val bad = out("embeddings")
      .withColumn("copy", (col("vec_id") / base).cast("int"))
      .withColumn("src_id", col("vec_id") % base)
      .join(s, "src_id")
      .filter(
        abs(element_at(col("embedding"), 1) - element_at(col("s_emb"), 1) -
          col("copy") * lit(1e-4)) > 1e-6 ||
        !(slice(col("embedding"), 2, 10000) === slice(col("s_emb"), 2, 10000)))
      .count()
    assert(bad === 0L)
  }
}
