package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model quality scoring: per-document average log-probability
  * under a word-bigram model trained on the corpus itself — the
  * perplexity-filter shape (docs whose token transitions are unusual for
  * the corpus score low and get cut first). A self-trained model is the
  * standard bootstrap when no external LM is shippable; swapping in
  * pretrained count tables changes nothing structurally.
  *
  * P(w2|w1) = c(w1 w2) / c(w1 ·) from exact corpus counts; the document
  * score is the mean of ln P over its bigrams. Counts and the count
  * ratio are exact; ln is the one libm op, and the 6-decimal export
  * rounding absorbs its last-bit variance (the q30 cross-engine
  * contract).
  *
  * Scale shape: the bigram stream is assembled scan-side (codegen'd
  * WordShingles explode — no exchange) and checkpointed once for its
  * three consumers (both count tables and the scoring join). The model
  * tables are vocabulary²-bounded, not corpus-bounded; scoring joins by
  * bigram key with map-side partial counts on both model aggregations.
  * Nothing collects; no O(corpus) state anywhere. */
object LmScore {

  /** (idCol, n_bigrams, avg_logp) per document with >= 2 tokens;
    * avg_logp rounded to 6 decimals. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = NearDup.shingleRows(df, idCol, textCol, 2)
      .select(col(idCol),
        split(col("shingle"), " ").getItem(0).as("w1"),
        col("shingle").as("bg"))
      .localCheckpoint()
    val c12 = bg.groupBy(col("bg")).agg(count(lit(1)).as("n12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    bg.join(c12, Seq("bg"))
      .join(c1, Seq("w1"))
      .select(col(idCol),
        log(col("n12").cast("double") / col("n1")).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logp"))
  }
}
