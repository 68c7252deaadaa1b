package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the sf0.1 fixture — the corpus behind
  * SCALING.md's measured (not argued) linearity table. The N× corpus is
  * N DISJOINT shifted copies of the source tables: copy k offsets every
  * key column by k·(max+1), so per-copy statistics (group sizes, join
  * fan-outs, dup-cluster shapes, graph degree distributions) are
  * IDENTICAL to the source and total work should scale ≈ N — any
  * superlinear wall-time is an operator defect (quadratic candidate
  * blowup, driver collect, broadcast overflow), not a data artifact.
  *
  * Text columns need care: a verbatim copy would make every doc an
  * exact cross-copy duplicate (LSH buckets grow N×, candidate pairs
  * N², superlinear BY CONSTRUCTION), so copy k suffixes every
  * non-profile token with a copy tag. That keeps word shingles
  * cross-copy DISJOINT (bigram (a,b) maps bijectively to (a_k,b_k))
  * while language-id and quality scores are preserved EXACTLY: the
  * language profiles' stopwords are left untouched, so stopword counts,
  * token counts, and within-doc distinctness — everything langid and
  * qualityScore read — are unchanged. The only cross-copy shingle
  * sharing left is stopword-only bigrams, which exact-Jaccard verify
  * discards and the bucket guard bounds.
  *
  * Embeddings perturb element 0 by k·1e-4 — enough to break exact
  * duplication (semantic-dedup degeneracy), far too small to move
  * cluster assignments, so IVF cell populations scale exactly N×.
  *
  * No RNG anywhere: the output is a pure function of (source, copies).
  *
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <copies>
  */
object ScaleGen {

  private val profileWords: Seq[String] =
    graft.functions.TextFunctions.langProfiles.flatMap(_._2)

  /** Copy-k view of a table: key columns shifted by k·(max+1).
    * `private[graft]` so ScaleGenProps can property-test the tagging
    * unit (quality/langid preservation, cross-copy vocab disjointness)
    * without writing parquet per ScalaCheck sample. */
  private[graft] def shifted(df: DataFrame, k: Int, offsets: Map[String, Long],
      tagTextCols: Seq[String] = Nil): DataFrame = {
    val keyed = offsets.foldLeft(df) { case (d, (c, base)) =>
      d.withColumn(c, col(c) + lit(k * base))
    }
    tagTextCols.foldLeft(keyed) { (d, c) =>
      if (k == 0) d
      else d.withColumn(c,
        array_join(
          transform(split(col(c), "\\s+"), t =>
            when(t.isin(profileWords: _*), t)
              .otherwise(concat(t, lit(s"x${k}q")))),
          " "))
    }
  }

  private def maxPlus1(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int): Unit = {
    def src(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    def writeCopies(name: String, df: DataFrame,
        offsets: Map[String, Long], tagTextCols: Seq[String] = Nil,
        parts: Int = 32): Unit = {
      val all = (0 until copies)
        .map(k => shifted(df, k, offsets, tagTextCols))
        .reduce(_ unionAll _)
      all.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name x$copies written")
    }

    // shared offset so the lineitem⋈orders key space stays aligned
    val li = src("lineitem")
    val ord = src("orders")
    val okBase = math.max(maxPlus1(li, "l_orderkey"),
      maxPlus1(ord, "o_orderkey"))
    writeCopies("lineitem", li, Map(
      "l_orderkey" -> okBase,
      "l_partkey" -> maxPlus1(li, "l_partkey"),
      "l_suppkey" -> maxPlus1(li, "l_suppkey")))
    writeCopies("orders", ord, Map(
      "o_orderkey" -> okBase,
      "o_custkey" -> maxPlus1(ord, "o_custkey")))
    val ev = Tables.normalizeEventTs(src("events"))
    writeCopies("events", ev, Map(
      "event_id" -> maxPlus1(ev, "event_id"),
      "user_id" -> maxPlus1(ev, "user_id")))
    val docs = src("documents")
    writeCopies("documents", docs,
      Map("doc_id" -> maxPlus1(docs, "doc_id")),
      tagTextCols = Seq("text"))
    val emb = src("embeddings")
    val embCopies = (0 until copies).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * maxPlus1(emb, "vec_id")))
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit((k * 1e-4).toFloat)).otherwise(x)))
    }.reduce(_ unionAll _)
    embCopies.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scalegen] embeddings x$copies written")
    // bounded dims: copied verbatim (data-model-bounded, not
    // data-volume-bounded — the same reason they broadcast at any SF)
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      if (new java.io.File(s"$srcDir/$n.parquet").exists()) {
        src(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
        println(s"[scalegen] $n copied")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copies) = args
    val spark = GraftSession.getOrCreate("local[32]")
    generate(spark, srcDir, outDir, copies.toInt)
    spark.stop()
  }
}
