package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 full-text retrieval over a document corpus: the lexical half of a
  * RAG/serving stack (the vector half is `Similarity`/`Ivf`/`Pq`).
  *
  * Scoring is the BM25 shape (Robertson et al., Okapi) with one deliberate
  * substitution, following `Keywords`' engine-portability discipline: the
  * idf factor is the RATIONAL form (N - df + 1/2)/(df + 1/2) rather than
  * its logarithm, and the whole per-term score is evaluated in exact
  * integer arithmetic (DECIMAL(38,0) intermediates, ppm export):
  *
  *   score_ppm(t, d) = floor( (2N - 2df + 1) * 22 * tf * L * 10^6
  *                          / ((2df + 1) * (10*L*tf + 3*L + 9*dl*N)) )
  *
  * which is exactly idf_rational * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  * with k1 = 6/5, b = 3/4 and avgdl = L/N, multiplied through by 10*L
  * (L = total corpus tokens, dl = document length). Per-fixed-(tf, dl) the
  * rational idf orders terms identically to log-idf; the cross-term SUM
  * weights rare terms harder than log would — documented, tunable, and in
  * exchange every engine (Spark, DuckDB, Athena) reproduces the ranking
  * bit-for-bit: no libm in scores.
  *
  * Scale shape: tokenize → explode → (term, doc) hash-agg with map-side
  * partials; df is a second partial-agg over the already-reduced (term,
  * doc) rows, never the raw token stream; (N, L) ride along as ONE
  * broadcast row. A probe touches only its query's terms: against the
  * materialized index that is a term-bucket partition-pruned scan of the
  * postings table — cost tracks posting-list length, not corpus size.
  */
object Bm25 {

  /** Posting rows for a corpus: (term, id, tf, dl). One explode + one
    * hash-agg; dl is counted in the same pass (size of the token array,
    * computed scan-side before the explode). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(col("__toks")).as("term"),
        size(col("__toks")).as("dl")) // ONE split feeds term stream AND dl
      .filter(length(col("term")) >= 1)
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** One-row corpus stats (n docs, l total tokens) from the docs table. */
  private def stats(docs: DataFrame, idCol: String, textCol: String) =
    docs.agg(
      countDistinct(col(idCol)).as("__n"),
      sum(TextFunctions.tokenCount(col(textCol))).as("__l"))

  /** The exact-integer BM25 ppm score for one (tf, dl) posting given
    * (__df, __n, __l) columns in scope. DECIMAL(38,0) intermediates: at
    * corpus scale (N ~ 1e9 docs, L ~ 1e13 tokens) the numerator reaches
    * ~1e30 — past BIGINT, comfortably inside DECIMAL(38,0); the final
    * ppm quotient is back under 1e16 and exported as BIGINT. */
  private val scorePpm = expr(
    """CAST((CAST(2 * __n - 2 * __df + 1 AS DECIMAL(38,0)) * 22 * tf * __l
      |       * 1000000)
      | div (CAST(2 * __df + 1 AS DECIMAL(38,0))
      |       * (10 * CAST(__l AS DECIMAL(38,0)) * tf + 3 * __l
      |          + 9 * CAST(dl AS DECIMAL(38,0)) * __n))
      | AS BIGINT)""".stripMargin)

  /** Direct (no index) BM25 top-k: score every document containing at
    * least one query term, rank by summed ppm score, ties by id.
    * Output: (idCol, matched, score_ppm). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int): DataFrame = {
    require(query.nonEmpty, "empty query")
    require(k > 0, s"k must be positive, got $k")
    // df(t) = #docs containing t = posting-row count for t, so the
    // term filter commutes with the df count: one filtered tokenize
    // pass (checkpointed — two consumers) serves scoring AND df.
    val post = postings(docs, idCol, textCol)
      .filter(col("term").isin(query.distinct: _*))
      .ckpt()
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    scoreAndRank(post, dfreq, stats(docs, idCol, textCol), idCol, k)
  }

  private def scoreAndRank(post: DataFrame, dfreq: DataFrame,
      statsDf: DataFrame, idCol: String, k: Int): DataFrame =
    post
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(statsDf))
      .select(col(idCol), col("term"), scorePpm.as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched"), sum(col("__s")).as("score_ppm"))
      .orderBy(desc("score_ppm"), col(idCol))
      .limit(k)

  /** Batched multi-query BM25: `queryTerms` is a (query_id, term) table
    * (one row per distinct term of each query). ONE tokenize pass over
    * the corpus serves every query — the per-query loop a serving tier
    * would otherwise run becomes a broadcast join against the posting
    * rows, so cost is O(corpus + total matched postings) regardless of
    * how many queries ride in the batch. Per-query top-k via a window
    * partitioned by query_id (rank state is per-query, never global).
    * Output: (query_id, idCol, matched, score_ppm), rank order within
    * each query = (score desc, id). */
  def topKBatch(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = queryTerms.select(col("query_id"), col("term")).distinct()
    // the batch's term universe is serving-batch-sized by contract:
    // collect it so the term filter is an `isin` PREDICATE Catalyst can
    // push below the postings aggregation (a join would sit above the
    // groupBy and force tf for every term in the corpus).
    val termList = q.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    // df(t) over rows filtered to the batch's term universe equals global
    // df(t): the filter is per-term, so it commutes with the per-term count.
    val post = postings(docs, idCol, textCol)
      .filter(col("term").isin(termList: _*))
      .ckpt()
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = post
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats(docs, idCol, textCol)))
      .join(broadcast(q), Seq("term"))
      .select(col("query_id"), col(idCol), scorePpm.as("__s"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("matched"), sum(col("__s")).as("score_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("score_ppm"), col(idCol))
    scored
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .drop("__rnk")
      .orderBy(col("query_id"), desc("score_ppm"), col(idCol))
  }

  /** Materialize the index: postings partitioned by a term-hash bucket
    * (pruning key only — never in scores), a per-term df table under the
    * same bucketing, and the one-row stats table. Layout:
    * {path}/postings/bucket=*, {path}/terms/bucket=*, {path}/stats. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val post = postings(docs, idCol, textCol)
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets)))
      .ckpt() // one tokenize pass feeds postings AND df
    post.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    post.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("__df"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/terms")
    stats(docs, idCol, textCol).write.mode("overwrite")
      .parquet(s"$path/stats")
  }

  /** Stateless per-row postings (STREAM-SAFE form of [[postings]]): tf
    * comes from counting inside each document's own token array instead
    * of a groupBy, so the transform is a pure projection — no streaming
    * aggregation, no watermark, and the exactly-once parquet stream sink
    * applies. Identical rows to [[postings]] by construction (PostingsSpec
    * pins it). */
  def postingsStateless(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(array_distinct(col("__toks"))).as("term"))
      .filter(length(col("term")) >= 1)
      .select(col(idCol), size(col("__toks")).as("dl"), col("term"),
        size(filter(col("__toks"), _ === col("term"))).cast("long").as("tf"))

  /** Continuous lexical-index maintenance: drain new document files from
    * `srcDir` into the bucket-partitioned postings table at
    * `path`/postings, exactly once across restarts (file-sink metadata
    * log + checkpoint = the bookmark). A second drain ([[doclenIngestOnce]])
    * maintains `path`/doclen — the slim (id, dl) table probes read their
    * (N, L) corpus stats from. Maintenance cost tracks NEW documents,
    * never corpus size; a crashed drain replays its batch into the sink
    * log idempotently. Probe with [[topKStreamed]]. */
  def indexIngestOnce(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, path: String,
      checkpointDir: String, idCol: String, textCol: String,
      buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val post = postingsStateless(
      spark.readStream.schema(schema).parquet(srcDir), idCol, textCol)
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets)))
    val q = post.writeStream
      .format("parquet")
      .partitionBy("bucket")
      .option("path", s"$path/postings")
      .option("checkpointLocation", s"$checkpointDir/postings")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dl = spark.readStream.schema(schema).parquet(srcDir)
      .select(col(idCol), TextFunctions.tokenCount(col(textCol))
        .cast("long").as("dl"))
    val q2 = dl.writeStream
      .format("parquet")
      .option("path", s"$path/doclen")
      .option("checkpointLocation", s"$checkpointDir/doclen")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
  }

  /** Probe a stream-maintained index ([[indexIngestOnce]] layout): df(t)
    * comes from the SAME pruned posting scan that scoring reads (a
    * term's df is its posting-row count — no separate terms table to
    * keep transactionally consistent with the postings), and (N, L) from
    * the slim doclen table. Identical output to [[topK]] over the union
    * of all drained documents. */
  def topKStreamed(spark: SparkSession, path: String, idCol: String,
      query: Seq[String], k: Int, buckets: Int = 64): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.distinct
    // bucket ids via the same pmod(xxhash64) the writer used, evaluated
    // on a |terms|-row local relation (O(query), not O(corpus))
    val qBuckets = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qBuckets: _*) &&
        col("term").isin(terms: _*))
      .ckpt() // one pruned scan feeds df AND scoring
    val dfreq = post.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val statsDf = spark.read.parquet(s"$path/doclen")
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__l"))
    scoreAndRank(post.drop("bucket"), dfreq, statsDf, idCol, k)
  }

  /** Probe the materialized index: reads ONLY the query terms' buckets
    * (partition pruning on the term-hash bucket + term pushdown inside
    * each bucket), so probe cost tracks posting-list length rather than
    * corpus size. Identical output to [[topK]] by construction. */
  def topKIndexed(spark: SparkSession, path: String, idCol: String,
      query: Seq[String], k: Int, buckets: Int = 64): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.distinct
    // bucket ids for the query terms: same hash the writer used, computed
    // on a |terms|-row local relation (driver-side, O(query) not O(corpus))
    val qBuckets = spark.createDataFrame(terms.map(Tuple1(_)))
      .toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets)).as("b"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qBuckets: _*) &&
        col("term").isin(terms: _*))
    val dfreq = spark.read.parquet(s"$path/terms")
      .filter(col("bucket").isin(qBuckets: _*) &&
        col("term").isin(terms: _*))
      .select(col("term"), col("__df"))
    val statsDf = spark.read.parquet(s"$path/stats")
    scoreAndRank(post.drop("bucket"), dfreq, statsDf, idCol, k)
  }
}
