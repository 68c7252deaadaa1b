package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Vocabulary truncation + OOV normalization: build the corpus's top-k
  * token vocabulary and rewrite every document with out-of-vocabulary
  * tokens replaced by a sentinel — the classic closed-vocab prep stage
  * (and the shape of any "normalize the long tail" rewrite).
  *
  * Scale shape: token counting is explode → partial-agg; the top-k
  * vocabulary is a TakeOrderedAndProject (k rows to the driver side of
  * the plan, never the counts table); the rewrite joins the token stream
  * against the BROADCAST vocabulary and reassembles per document with
  * one shuffle by id. The token stream is checkpointed once for its two
  * consumers (counts, rewrite). Ties at the k-th frequency break on the
  * token string, so the vocabulary — and every rewrite — is
  * deterministic at any parallelism. */
object Vocab {

  /** (idCol, clean_text, n_unk) per document; vocabulary = top `k`
    * tokens by (count desc, token asc). */
  def truncateToTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int, unk: String = "<unk>"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = df
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .ckpt()
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("tok")).limit(k)
      .select(col("tok"), lit(1).as("__inv"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .select(col(idCol), col("pos"),
        when(col("__inv").isNotNull, col("tok")).otherwise(lit(unk))
          .as("tok2"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok2")))),
          s => s.getField("tok2")), " ").as("clean_text"),
        count(when(col("tok2") === unk, 1)).as("n_unk"))
  }
}
