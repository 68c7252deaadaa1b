package graft.operators

import graft.util.Ckpt.CkptOps
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
      .ckpt()
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

  /** Collocation detection: the corpus's top-`k` bigrams by pointwise
    * mutual information, PMI = ln(p(w1 w2) / (p(w1)·p(w2))) — pairs that
    * co-occur far more than their token frequencies predict ("new york"
    * behavior; with this synthetic corpus, whatever sticks).
    *
    * Ranking NEVER touches ln: it orders on the ratio itself, computed
    * as a fixed-order chain of IEEE double ops over exact integer counts
    * ((c12·Nt)·Nt / ((Nbg·c1)·c2)) — identical on every engine at any
    * corpus size (each factor is an exact count ≤ 2^53; no decimal
    * overflow games). ln is applied only to the exported value and
    * rounded to 6dp (the q30 contract). `minCount` keeps
    * one-off pairs — whose PMI is huge and meaningless — out.
    *
    * Scale shape: one scan-side bigram explode feeding two partial
    * aggregations; totals ride as a broadcast row; the candidate set
    * after `minCount` is vocabulary²-bounded and top-k is
    * TakeOrderedAndProject. */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, k: Int = 20): DataFrame = {
    // Both count tables are vocabulary-bounded and each feeds multiple
    // consumers (joins + their own totals) — checkpoint them so the
    // corpus is tokenized exactly twice (once per table), and derive
    // BOTH totals from the aggregates (Σcu = token count, Σn12 = bigram
    // count) instead of re-scanning the corpus for a count(*).
    val uni = df
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      .ckpt()
    val c12 = NearDup.shingleRows(df, idCol, textCol, 2)
      .select(split(col("shingle"), " ").getItem(0).as("w1"),
        split(col("shingle"), " ").getItem(1).as("w2"),
        col("shingle").as("bg"))
      .groupBy(col("bg"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
      .ckpt()
    // both sides are one-row aggregates; broadcast explicitly so a
    // refactor can never silently inflate this into a real cross join
    val totals = uni.agg(sum(col("cu")).as("__nt"))
      .crossJoin(broadcast(c12.agg(sum(col("n12")).as("__nb"))))
    c12.filter(col("n12") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bg"), col("n12"),
        (col("n12").cast("double") * col("__nt") * col("__nt") /
          (col("__nb").cast("double") * col("c1") * col("c2")))
          .as("__ratio"))
      .orderBy(desc("__ratio"), col("bg"))
      .limit(k)
      .select(col("bg"), col("n12"), round(log(col("__ratio")), 6).as("pmi"))
  }
}
