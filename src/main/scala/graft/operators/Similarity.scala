package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single projection +
  * TakeOrderedAndProject, embarrassingly parallel (the score is computed
  * where the vectors live; only k rows per partition reach the driver).
  * Scale path: random-hyperplane LSH buckets so candidate generation
  * touches ~1/2^H of the corpus per query, plus an embedding-cosine
  * near-dup join that shuffles bucket keys, not vectors.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns — a custom
    * codegen'd Catalyst expression (one fused primitive loop inside
    * WholeStageCodegen; see [[graft.expressions.CosineSimilarity]]). The
    * `zip_with`+`aggregate` built-in route evaluates its lambdas
    * interpreted per element, which dominates ANN scan cost. */
  def cosine(a: Column, b: Column): Column = GraftFunctions.cosine(a, b)

  /** Brute-force cosine top-k against one query vector (given as the row of
    * `df` with id == queryId). The query row is broadcast; the scan computes
    * one score per row and top-k is TakeOrderedAndProject — no sort of the
    * full corpus, no shuffle of vectors. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-LSH. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit h = sign of dot(vec, plane_h). Vectors with
    * high cosine similarity collide with high probability. ONE fused
    * codegen loop with the plane matrix in the references
    * ([[GraftFunctions.lshBandBuckets]] with a single band) — the
    * previous per-plane unrolled form embedded every plane as literals,
    * so each distinct plane set compiled its own many-KB codegen unit
    * (the k-means-literal problem `NearestCellId` fixed for IVF/PQ).
    * Bit semantics identical: bit h set iff dot > 0; a NULL vector
    * keeps the old form's bucket 0 (when/otherwise folded nulls). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.headOption.map(_.length).getOrElse(0)
    require(planes.forall(_.length == dim), "ragged plane matrix")
    coalesce(
      element_at(GraftFunctions.lshBandBuckets(vec.cast("array<double>"),
        planes.flatten.toArray, 1, planes.size, dim), 1),
      lit(0L))
  }

  /** LSH-bucketed ANN: restrict the cosine scan to the query's bucket (and
    * optionally its Hamming-1 neighbor buckets via `multiProbe`). At corpus
    * scale this reads a ~1/2^numPlanes slice; bucketing the table on
    * `bucket` turns it into partition pruning. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, numPlanes: Int = 8, dim: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val withBucket = df.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), col("bucket").as("__qbucket"))
    val probed = withBucket.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
    val inProbe =
      if (multiProbe)
        bit_count(col("bucket").bitwiseXOR(col("__qbucket"))) <= 1
      else col("bucket") === col("__qbucket")
    probed.filter(inProbe)
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cos"),
        col("bucket"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Materialize the sign-LSH bucket assignment once: the corpus written
    * partitioned by bucket — the sign-LSH analog of [[Ivf.writeIndex]].
    * Every later probe is partition pruning: multi-probe reads
    * (numPlanes+1)/2^numPlanes of the files instead of scanning the
    * corpus and filtering (at 100 TB, the difference between touching
    * ~3.5% of the files and reading everything). */
  def writeLshIndex(df: DataFrame, vecCol: String, path: String,
      numPlanes: Int = 8, dim: Int = 64): Unit = {
    require(!df.columns.contains("bucket"),
      "input already has a 'bucket' column; rename it before LSH indexing")
    df.withColumn("bucket", lshBucket(col(vecCol), hyperplanes(numPlanes, dim)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Multi-probe (Hamming<=1) top-k against a materialized
    * [[writeLshIndex]] table: the bucket isin-filter lands on the
    * partition column, so only the query bucket's and its numPlanes
    * neighbor buckets' files are read. Same output as [[lshTopK]]. */
  def lshTopKIndexed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, query: Seq[Double], queryBucket: Long, queryId: Long,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val probeBuckets = (0L +: (0 until numPlanes).map(1L << _))
      .map(queryBucket ^ _)
    spark.read.parquet(path)
      .filter(col("bucket").isin(probeBuckets: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        cosine(col(vecCol), typedLit(query)).as("cos"),
        col("bucket").cast("long").as("bucket"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Driver-side twin of [[lshBucket]] for a single query vector: same
    * plane order, same sequential dot-product accumulation order, same
    * `> 0` sign rule — bit-identical to the codegen'd column. */
  def bucketOf(query: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (plane, h) =>
      var d = 0.0
      var i = 0
      while (i < plane.length) { d += plane(i) * query(i); i += 1 }
      if (d > 0) 1L << h else 0L
    }.reduce(_ | _)

  /** Multi-table sign-LSH index: `tables` independent hash tables (seeded
    * hyperplane sets), each row written once per table, partitioned by
    * (htable, bucket). THE recall knob for sign-LSH: one table's probe
    * finds a neighbor with probability p, L tables raise it to
    * 1-(1-p)^L — the standard construction when neighborhoods are diffuse
    * (this corpus's true top-10 sit at mean cosine ~0.31, where any
    * single-table probe is weak; measured recall goes 0.11 (one 8-plane
    * table) → ~0.9 (4 tables × 4 planes), see SCALING.md). Cost is
    * explicit: tables× the storage and tables×(numPlanes+1) probed cells
    * per query — at 100 TB you buy recall with space, not with a corpus
    * scan. */
  def writeMultiLshIndex(df: DataFrame, vecCol: String, path: String,
      tables: Int = 4, numPlanes: Int = 4, dim: Int = 64): Unit = {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    Seq("htable", "bucket").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column; rename it before LSH indexing"))
    val bucketCols = (0 until tables).map(t =>
      lshBucket(col(vecCol), hyperplanes(numPlanes, dim, 42L + t)))
    df.select(col("*"),
        posexplode(array(bucketCols: _*)).as(Seq("htable", "bucket")))
      .write.mode("overwrite").partitionBy("htable", "bucket").parquet(path)
  }

  /** Multi-probe top-k against a [[writeMultiLshIndex]] table: per table,
    * the query bucket and its Hamming-1 neighbors; the OR of per-table
    * predicates sits entirely on partition columns, so only probed cells'
    * files are read. Candidates found by several tables dedup by id
    * before ranking. */
  def multiLshTopKIndexed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, query: Seq[Double], queryId: Long, k: Int,
      tables: Int = 4, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val pred = (0 until tables).map { t =>
      val qb = bucketOf(query, hyperplanes(numPlanes, dim, 42L + t))
      val probes = (0L +: (0 until numPlanes).map(1L << _)).map(qb ^ _)
      col("htable") === t && col("bucket").isin(probes: _*)
    }.reduce(_ || _)
    spark.read.parquet(path)
      .filter(pred && col(idCol) =!= queryId)
      .dropDuplicates(idCol)
      .select(col(idCol),
        cosine(col(vecCol), typedLit(query)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** [[writeLshIndex]] with int8-quantized vectors: bucket partitioning
    * buys partition-pruned probes AND the index stores each vector as a
    * dense BINARY (one byte per element; array<tinyint> would physically
    * store INT32 per element in parquet and save nothing) — the probe
    * reads ~(numPlanes+1)/2^numPlanes of the files at a quarter of the
    * bytes per file. Cosine's scale invariance means ranking quality is
    * the quantization error only (|Δcos| < 0.01 at dim 64,
    * VectorExpressionsSpec). */
  def writeQuantizedLshIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, numPlanes: Int = 8, dim: Int = 64): Unit = {
    require(!df.columns.contains("bucket"),
      "input already has a 'bucket' column; rename it before LSH indexing")
    df.select(col(idCol),
        GraftFunctions.quantizeInt8Binary(col(vecCol).cast("array<double>"))
          .as("q8"),
        lshBucket(col(vecCol), hyperplanes(numPlanes, dim)).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Multi-probe top-k against a [[writeQuantizedLshIndex]] table: the
    * query is quantized with the same scalar contract and scored against
    * the int8 binary corpus directly (fused [[GraftFunctions.cosineInt8]]
    * loop — no dequantization, no array materialization). */
  def quantizedLshTopKIndexed(spark: SparkSession, path: String,
      idCol: String, query: Seq[Double], queryBucket: Long, queryId: Long,
      k: Int, numPlanes: Int = 8): DataFrame = {
    val qq = VectorQuant.quantizeVec(query).map(_.toByte).toArray
    val probeBuckets = (0L +: (0 until numPlanes).map(1L << _))
      .map(queryBucket ^ _)
    spark.read.parquet(path)
      .filter(col("bucket").isin(probeBuckets: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        GraftFunctions.cosineInt8(col("q8"), typedLit(qq)).as("cos"),
        col("bucket").cast("long").as("bucket"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Top-k similarity join: for EVERY query vector, its k nearest corpus
    * vectors — the batch form of ANN (SURVEY.md §7.1's "top-k similarity
    * join"). Candidates meet in an equi join on the LSH bucket (multi-probe
    * Hamming<=1 via bucket expansion on the smaller query side), then a
    * per-query window rank keeps k. The corpus is never cross-joined: the
    * shuffle keys on the bucket id. */
  def topKJoin(queries: DataFrame, corpus: DataFrame, queryIdCol: String,
      corpusIdCol: String, vecCol: String, k: Int, numPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    // Expand each query into its own bucket + all Hamming-1 neighbors so
    // the candidate meet stays an equi join.
    val probes = typedLit(0L +: (0 until numPlanes).map(1L << _))
    val qb = queries.select(col(queryIdCol), col(vecCol).as("__qvec"),
        lshBucket(col(vecCol), planes).as("__b0"))
      .withColumn("__probe", explode(probes))
      .select(col(queryIdCol), col("__qvec"),
        col("__b0").bitwiseXOR(col("__probe")).as("bucket"))
    val cb = corpus.select(col(corpusIdCol), col(vecCol).as("__cvec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(desc("cos"), col(corpusIdCol))
    qb.join(cb, Seq("bucket"))
      .filter(col(queryIdCol) =!= col(corpusIdCol))
      .select(col(queryIdCol), col(corpusIdCol),
        cosine(col("__qvec"), col("__cvec")).as("cos"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Embedding-cosine near-duplicate pairs: banded sign-LSH candidate
    * generation + exact cosine verify (the vector analogue of
    * NearDup.minhashPairs).
    *
    * A pair is a candidate iff all `planesPerBand` sign bits agree in at
    * least one of `bands` bands — recall for cosine s is 1−(1−p^P)^B with
    * p = 1 − arccos(s)/π, so bands buy recall while planesPerBand bounds
    * within-bucket pair counts (2^P cells per band; grow P with log2 of
    * the corpus — 8 planes = 256 cells/band already keeps the per-cell
    * self-join linear-ish on real skewed corpora, vs the single-bucket
    * form whose cell count was fixed).
    *
    * Shuffle discipline: the bucket self-join carries (id, band, bucket)
    * keys — never the vector. Candidate generation is
    * [[NearDup.bandedCandidates]]: exact first-small-cell pair
    * semantics, and cells beyond `maxBucketSize` degrade to
    * representative stars (the duplicate-heavy-crawl guard). Vectors
    * then meet the already-unique pairs in id equi-joins (AQE
    * broadcasts the vector side when small; sort-merge on id at corpus
    * scale). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 8, planesPerBand: Int = 8,
      dim: Int = 64, maxBucketSize: Int = 1000): DataFrame = {
    // One custom expression computes all banded buckets in a single fused
    // loop (plane matrix in the codegen references). Composing the
    // per-plane lshBucket form here would inline bands*planesPerBand dot
    // expressions, and the optimizer's explode size-guard copies that
    // monster into Filter and FileScan — past HotSpot's JIT limit, the
    // scan ran interpreted (~3 s for 2k rows; this form is milliseconds).
    val planeMatrix = hyperplanes(bands * planesPerBand, dim)
      .flatten.toArray
    val bucketArr = GraftFunctions.lshBandBuckets(
      col(vecCol).cast("array<double>"), planeMatrix, bands, planesPerBand, dim)
    // (id, bucket-array) is 9 longs per doc and feeds several consumers:
    // checkpoint it so the vector scan + banded projection run once, not
    // per consumer (physical exchange reuse does not survive each
    // branch's pushed predicates). The verify joins below still read
    // vectors from the source scan — vectors are never duplicated into
    // the checkpoint.
    val ids = df.select(col(idCol).as("__id"), bucketArr.as("__bks"))
      .ckpt()
      .select(col("__id"), posexplode(col("__bks")).as(Seq("__band", "__bkt")))
    NearDup.bandedCandidates(ids, "__id", "__band", "__bkt", bands,
        maxBucketSize)
      .join(df.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(df.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("__va"), col("__vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
