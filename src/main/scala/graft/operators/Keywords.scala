package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document keyword extraction by TF-IDF ranking.
  *
  * The inverse-document-frequency factor is the RATIONAL form N/df, not
  * log(N/df): the score `tf·N·10^6 div df` is exact integer arithmetic
  * end to end, so ranking and export are bit-identical on any engine
  * (libm's log is not guaranteed correctly rounded across platforms —
  * the one primitive that would make the oracle flaky). For ranking,
  * log-idf and rational idf are order-equivalent per fixed tf (both are
  * monotone in 1/df); the composite tf·idf ordering differs only in how
  * hard repeated terms are rewarded, which the caller tunes by k anyway.
  *
  * Scale shape: explode → (doc, term) hash-agg with map-side partial
  * counts; document frequency is a second partial-agg over the
  * already-aggregated (doc, term) rows (never the raw token stream); the
  * term-keyed join meets two term-partitioned aggregates; the final
  * top-k is a per-doc window rank, bounded per reducer stream. The
  * corpus size N rides along as one broadcast row — no driver action,
  * no collect. */
object Keywords {

  /** Top-`k` terms per document by `tf · N · 10^6 div df` (ties broken
    * by term). Tokens shorter than `minTokenLen` are ignored (cheap
    * stopword-ish guard that needs no language list). Output:
    * (idCol, term, tf, score_ppm). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int,
      minTokenLen: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ndocs = df.agg(countDistinct(col(idCol)).as("__n"))
    // Two consumers (the df branch and the join) — checkpoint so the
    // tokenize→explode→aggregate pipeline runs once, not per consumer
    // (physical exchange reuse does not survive per-branch pushdown; the
    // repo-wide multi-consumer discipline).
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .ckpt()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("score_ppm"), col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(ndocs))
      .select(col(idCol), col("term"), col("tf"),
        expr("(tf * __n * 1000000) div __df").as("score_ppm"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
