package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted physical plan of selected
  * queries so scan pruning (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be reviewed. Usage:
  *   runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q02_star_revenue", "q03_cleanse_lineitem", "q06_dedup_events",
        "q18_topk", "q27_minhash_pairs", "q30_cosine_topk", "q33_cosine_neardup",
        "q56_asof_join", "q65_range_join", "q68_ivf_indexed", "q71_lsh_indexed",
        "q73_skew_neardup", "q75_hash_split", "q77_vector_norm",
        "q80_pack_bins", "q82_decontaminate", "q87_merge_upsert",
        "q89_snapshot_diff", "q91_quantized_topk", "q101_weighted_sample",
        "q103_keywords", "q104_span_dedup", "q105_stream_join",
        "q112_vocab", "q115_collocations", "q116_psi",
        "q117_bloom_decontaminate")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
