package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings with k-means, then
  * inside each cluster drop every document whose cosine similarity to a
  * LOWER-id document of the same cluster exceeds `threshold`. The
  * minimum id of each semantic-duplicate group is the deterministic
  * keeper, so output is stable across runs, partitionings, and engines —
  * the same discipline as [[Dedup]]'s min-id winner and [[Sampling]]'s
  * hash buckets. This is the dedup tier between exact/minhash (surface
  * overlap) and nothing: it removes *semantic* redundancy that shares no
  * n-grams (translations, paraphrases, templated rewrites), which is the
  * layer the reference's dedup stage cannot see (reference:
  * README.md:85,95 declares surface dedup only).
  *
  * Scale shape: the k-means [[Ivf.Model]] is tiny and drives a pure
  * scan-side assignment projection (no join — see [[Ivf.withCluster]]);
  * the only exchange is the within-cluster self-join, keyed on the
  * cluster id, carrying (id, vector). Per-reducer work is O(cell²) —
  * that quadratic meet is the published algorithm's cost model, bounded
  * by choosing k so cells stay near N/k. Because a degenerate cell is
  * the same silent hazard the banded-LSH `maxBucketSize` guard exists
  * for, cells beyond `maxClusterSize` FAIL FAST (listing the offending
  * cluster ids) instead of hanging a reducer: unlike the LSH family
  * there is no star fallback that preserves these semantics — a
  * too-big cell means the MODEL is wrong for the corpus (re-fit with
  * larger k), not that the pairs should be thinned.
  */
object SemDedup {

  /** Survivors of semantic dedup: one row per KEPT document,
    * (idCol, cluster). A document is dropped iff some lower-id document
    * in its cluster has cosine > threshold with it (whether or not that
    * document itself survives — the published rule, which a single
    * anti-join expresses; a keep-only-vs-survivors rule would be an
    * iterated fixpoint for marginal benefit). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      m: Ivf.Model, threshold: Double,
      maxClusterSize: Int = 100000): DataFrame = {
    val assigned = Ivf.withCluster(df, vecCol, m)
      .select(col(idCol), col("cluster"),
        col(vecCol).cast("array<double>").as("__v"))
    if (maxClusterSize > 0) {
      // bounded driver check: at most m.k rows come back
      val over = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxClusterSize)
        .collect()
      require(over.isEmpty,
        s"semanticDedup: cluster(s) ${over.map(_.getInt(0)).sorted.mkString(",")} " +
          s"exceed maxClusterSize=$maxClusterSize; re-fit with larger k " +
          "(the within-cluster meet would be quadratic in the cell)")
    }
    val x = assigned.select(col("cluster").as("__cx"),
      col(idCol).as("__idx"), col("__v").as("__vx"))
    val y = assigned.select(col("cluster").as("__cy"),
      col(idCol).as("__idy"), col("__v").as("__vy"))
    x.join(y,
        col("__cx") === col("__cy") && col("__idy") < col("__idx") &&
          GraftFunctions.cosine(col("__vx"), col("__vy")) > threshold,
        "left_anti")
      .select(col("__idx").as(idCol), col("__cx").as("cluster"))
  }
}
