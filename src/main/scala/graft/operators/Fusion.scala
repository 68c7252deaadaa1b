package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine several independent rankings
  * of the same id space (BM25 lexical, ANN vector, a quality prior) into
  * one list without comparing their incommensurable scores.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
  * score(d) = Σ_r 1/(k0 + rank_r(d)), k0 = 60. Following the repo's
  * engine-portability discipline the contribution is computed in exact
  * integer arithmetic — `10^9 div (k0 + rank)` parts-per-billion — so
  * Spark and any SQL oracle agree bit-for-bit and ties break identically.
  *
  * Scale shape: each ranking is already top-N (small); fusion is a
  * union + one hash-agg on id — no join against the corpus, no shuffle
  * wider than the union of the candidate lists. With R rankings of N
  * rows the whole fuse is O(R·N) regardless of corpus size.
  */
object Fusion {

  /** Fuse rankings, each a DataFrame with (`idCol`, `rank`) where rank is
    * 1-based and unique per ranking. Output: (idCol, n_systems, rrf_ppb)
    * ordered by fused score desc (ties by id), truncated to `k`. */
  def reciprocalRank(rankings: Seq[DataFrame], idCol: String, k: Int,
      k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    require(k > 0, s"k must be positive, got $k")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    rankings
      .map(_.select(col(idCol),
        expr(s"CAST(1000000000 DIV (rank + $k0) AS BIGINT)").as("__c")))
      .reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_systems"), sum(col("__c")).as("rrf_ppb"))
      .orderBy(desc("rrf_ppb"), col(idCol))
      .limit(k)
  }
}
