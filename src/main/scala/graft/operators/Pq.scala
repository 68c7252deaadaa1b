package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Product quantization (PQ) for embedding columns: split each vector
  * into `m` contiguous subvectors, k-means each subspace independently,
  * and store one centroid index per subspace — `m` small codes instead of
  * `dim` floats. The standard third rung of the vector-compression ladder
  * this engine ships (float → int8 [[VectorQuant]] → PQ), and the code
  * layout IVF-PQ systems use at the 100 TB scale where even int8 vectors
  * dominate the scan (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public literature).
  *
  * Codes pack into ONE BIGINT with 8-bit lanes (requires m ≤ 8, k ≤ 256):
  * a 64-dim float vector (256 B raw) becomes 8 bytes — a 32× footprint
  * cut, and the packed column is plain integer arithmetic end to end, so
  * shuffles carry longs, parquet dictionary-encodes them, and a DuckDB
  * oracle can replay both the assignment and the search exactly.
  *
  * Search is asymmetric-distance (ADC): the query stays un-quantized; the
  * driver precomputes the m×k table of squared L2 distances from each
  * query subvector to each centroid, and the per-row score is m literal
  * array lookups on the unpacked byte lanes — a pure codegen projection
  * over the code column, no join, no explode, no shuffle before the
  * global top-k. Probing a billion codes reads 8 GB, not 256 GB.
  *
  * Reference corpus declares embedding-similarity dedup/search workloads
  * (`/root/reference/README.md:85` analytics surface); PQ is the
  * engine-extension scale path, same contract as [[Ivf]]/[[Similarity]].
  */
object Pq {

  /** Per-subspace codebooks: `m` books × `k` centroids × `dim/m` doubles.
    * Tiny (m·k·subDim doubles) — lives on the driver, folds into plans as
    * literals, never joins. */
  final case class Model(codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    def m: Int = codebooks.size
    def k: Int = codebooks.map(_.size).max
    def subDim: Int = codebooks.head.head.size
    require(codebooks.nonEmpty && m <= 8 && k <= 256,
      s"packed PQ codes need m <= 8 and k <= 256, got m=$m k=$k")

    /** Squared L2 from each of query's m subvectors to each centroid —
      * the ADC lookup table (m×k doubles, driver-side). */
    def adcTable(query: IndexedSeq[Double]): IndexedSeq[IndexedSeq[Double]] =
      codebooks.zipWithIndex.map { case (book, s) =>
        val sub = query.slice(s * subDim, (s + 1) * subDim)
        book.map { c =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val t = sub(i) - c(i); d += t * t; i += 1
          }
          d
        }
      }
  }

  /** Train per-subspace codebooks: Lloyd's with [[Ivf.fit]]'s
    * deterministic init (the k lowest-id vectors, sliced per subspace).
    * All m subspaces advance together — ONE assignment+means job per
    * iteration instead of m independent fits (the m=8 fit was 8× the
    * driver round-trips for identical math). At corpus scale training
    * runs on a bounded sample, so pass one in; encoding (the
    * full-corpus pass) is a single projection regardless. */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int = 4,
      k: Int = 16, iters: Int = 3): Model = {
    val vd = col(vecCol).cast("array<double>")
    val dim = df.select(size(col(vecCol)).as("__n")).limit(1)
      .collect().head.getInt(0)
    require(m > 0 && dim % m == 0,
      s"vector dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val init = df.orderBy(col(idCol)).limit(k).select(vd.as("__v"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq)
    var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map(s =>
        init.map(v => v.slice(s * sub, (s + 1) * sub)).toIndexedSeq)
    (1 to iters).foreach { _ =>
      // one job: per-row codes for ALL subspaces, then mean per
      // (subspace, cluster, position-within-subspace)
      val codes = array((0 until m).map(s =>
        subCode(col("__v"), books(s), s, sub)): _*)
      val means = df.select(vd.as("__v"))
        .withColumn("__c", codes)
        .select(col("__c"), posexplode(col("__v")).as(Seq("pos", "x")))
        .select(
          (col("pos") / lit(sub)).cast("int").as("s"),
          element_at(col("__c"),
            (col("pos") / lit(sub)).cast("int") + 1).as("cluster"),
          pmod(col("pos"), lit(sub)).as("within"),
          col("x"))
        .groupBy(col("s"), col("cluster"), col("within"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val grouped = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = (0 until m).map { s =>
        books(s).indices.map { c =>
          grouped.get((s, c)) match {
            case Some(rows) =>
              val arr = new Array[Double](sub)
              rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
              arr.toIndexedSeq
            case None => books(s)(c) // empty cluster keeps its centroid
          }
        }.toIndexedSeq
      }.toIndexedSeq
    }
    Model(books)
  }

  /** Nearest-centroid code for subspace `s`, as a codegen'd projection:
    * ranks by ||c||² − 2·v·c (the ||v_sub||² term is constant within the
    * subspace argmin, so it cancels); ties break toward the lower code,
    * exactly like [[Ivf]] cell assignment — and exactly like the oracle's
    * first-match CASE over least(). The codebook rides in the codegen
    * REFERENCES and the subspace is an OFFSET into the full vector (no
    * slice materialized): one small cached codegen unit shared by every
    * iteration and every subspace shape, not m×iters unrolled-literal
    * compilations per fit ([[Ivf.nearestCluster]] discipline). */
  private def subCode(vd: Column, book: IndexedSeq[IndexedSeq[Double]],
      s: Int, subDim: Int): Column = {
    require(book.forall(_.length == subDim), "ragged codebook")
    // null vector → code 0 (not a NULL packed code) — [[Ivf]] discipline
    coalesce(
      GraftFunctions.nearestCell(vd, book.flatten.toArray, book.size, subDim,
        offset = s * subDim),
      lit(0))
  }

  /** The packed BIGINT code column: subspace s occupies bit lane
    * [8s, 8s+8). One projection over the scan — no join, no shuffle. */
  def codeColumn(vec: Column, model: Model): Column = {
    val vd = vec.cast("array<double>")
    model.codebooks.zipWithIndex.map { case (book, s) =>
      shiftleft(subCode(vd, book, s, model.subDim).cast("long"), 8 * s)
    }.reduceLeft[Column](_ bitwiseOR _)
  }

  /** Encode a corpus: (idCol, pq_code). The full-corpus pass is this one
    * scan-side projection; everything downstream touches 8-byte codes. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    df.select(col(idCol), codeColumn(col(vecCol), model).as("pq_code"))

  /** ADC distance column over a packed code column: an explicit
    * left-to-right sum of m literal-table lookups (element_at on an
    * m-entry literal per subspace, indexed by the unpacked byte lane).
    * The identical left-assoc addition chain over identical literals is
    * what lets a DuckDB oracle reproduce the double bit-for-bit. */
  def adcDistColumn(codeCol: Column, model: Model,
      query: IndexedSeq[Double]): Column =
    model.adcTable(query).zipWithIndex.map { case (table, s) =>
      element_at(typedLit(table.toSeq),
        (shiftright(codeCol, 8 * s).bitwiseAND(lit(255L))).cast("int") + 1)
    }.reduceLeft[Column](_ + _)

  /** ADC top-k over an encoded corpus: rank by asymmetric distance
    * ascending, ties toward the lower id. Output: (idCol, pq_code,
    * adc_dist). The plan is scan → projection → TakeOrderedAndProject —
    * the shape that holds at any corpus size. */
  def adcTopK(codes: DataFrame, idCol: String, model: Model,
      query: IndexedSeq[Double], queryId: Long, k: Int): DataFrame =
    codes.filter(col(idCol) =!= queryId)
      .select(col(idCol), col("pq_code"),
        adcDistColumn(col("pq_code"), model, query).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)

  /** One-stop search over a raw vector corpus: encode inline + ADC rank.
    * For repeated queries, [[encode]] once and reuse (or materialize —
    * the 8-byte codes make even a full-corpus rescan cheap). */
  def topK(df: DataFrame, idCol: String, vecCol: String, model: Model,
      query: IndexedSeq[Double], queryId: Long, k: Int): DataFrame =
    adcTopK(encode(df, idCol, vecCol, model), idCol, model, query,
      queryId, k)

  /** IVF-PQ index: [[Ivf.withCluster]] coarse assignment + packed PQ
    * codes, written partitioned by cluster — the layout billion-scale
    * ANN serving actually uses (Jégou et al. §IV). Each stored row is
    * (id, 8-byte code), so a 10⁹-vector corpus indexes to ~16 GB of
    * parquet, and a probe reads ~nProbe/k of the files via partition
    * pruning. The raw vectors stay in the source table and are touched
    * only by [[topKRefinedIndexed]]'s candidate rerank. */
  def writeIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, model: Model, path: String): Unit =
    Ivf.withCluster(df, vecCol, coarse)
      .select(col(idCol), codeColumn(col(vecCol), model).as("pq_code"),
        col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** ADC top-k against a [[writeIvfPqIndex]] table: the cluster
    * isin-filter lands on the partition column (only probed cells' files
    * are read) and the ADC projection runs over 8-byte codes. Output:
    * (idCol, cluster, pq_code, adc_dist). */
  def adcTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, model: Model, coarse: Ivf.Model,
      query: IndexedSeq[Double], queryId: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = coarse.nearestClusters(query, nProbe)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"), col("pq_code"),
        adcDistColumn(col("pq_code"), model, query).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** Indexed probe + exact rerank: the pruned-and-quantized pass
    * ([[adcTopKIndexed]]) nominates `candidates` ids, then ONLY those
    * rows' full vectors are fetched from the raw corpus (broadcast semi
    * join) and scored exactly. At scale this is the whole point of the
    * layout: the 100 TB of vectors is read at candidate-set size, the
    * index scan is pruned 8-byte codes. Output: (idCol, l2sq). */
  def topKRefinedIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, coarse: Ivf.Model, query: IndexedSeq[Double],
      queryId: Long, k: Int, candidates: Int, nProbe: Int = 2): DataFrame = {
    require(candidates >= k, s"candidates $candidates must be >= k $k")
    val cand = adcTopKIndexed(spark, path, idCol, model, coarse, query,
      queryId, candidates, nProbe).select(col(idCol))
    val vd = col(vecCol).cast("array<double>")
    corpus.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        (GraftFunctions.dot(vd, vd) -
          lit(2.0) * GraftFunctions.dot(vd, typedLit(query.toSeq)) +
          lit(query.map(x => x * x).sum)).as("l2sq"))
      .orderBy(col("l2sq"), col(idCol))
      .limit(k)
  }

  /** Batch serving: run a set of independent [[topKRefinedIndexed]]
    * probes as CONCURRENT Spark jobs (Spark's scheduler accepts jobs
    * from multiple threads; FIFO slots fill from whichever probe has
    * tasks ready). A serving tier never issues probes one at a time —
    * each probe is a tiny pruned job whose wall-clock is dominated by
    * scheduling latency, so overlapping them recovers the cluster: the
    * ann_e2e gate's 50-probe batch drops ~3×. Results are collected per
    * probe ((id, l2sq) rows, k each), keyed by query id; each probe's
    * output is bit-identical to its sequential form (same plan, same
    * determinism contract). `parallelism` bounds in-flight jobs so a
    * large batch cannot flood the scheduler. */
  def topKRefinedIndexedMany(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, coarse: Ivf.Model,
      queries: Seq[(Long, IndexedSeq[Double])], k: Int, candidates: Int,
      nProbe: Int = 2, parallelism: Int = 8): Map[Long, Seq[(Long, Double)]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      parallelism.max(1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = queries.map { case (qid, q) =>
        Future {
          qid -> topKRefinedIndexed(spark, path, corpus, idCol, vecCol,
              model, coarse, q, qid, k, candidates, nProbe)
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        }
      }
      Await.result(Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
  }

  // ---------------------------------------------------------------------
  // Residual IVF-PQ (Jégou et al. §IV-A): quantize r = v − centroid(cell)
  // instead of v. Residuals concentrate near zero, so the same m×k code
  // budget spends its resolution on the part of the vector the coarse
  // cell didn't already explain — the form production IVF-PQ systems use.
  //
  // No vector subtraction ever appears in a plan: the residual distance
  //   ||r − c_i||² = ||r||² − 2v·c_i + (||c_i||² + 2·cc_cell·c_i)
  // drops ||r||² in the per-subspace argmin, leaving the SAME v·c_i dot
  // products as plain PQ plus a per-(subspace, code, CELL) constant the
  // driver folds into a literal array indexed by the cluster column.
  // Everything stays codegen (element_at on literals + fused dot), and a
  // SQL oracle replays it with the identical literal tables.
  // ---------------------------------------------------------------------

  /** Per-code constant table for subspace `s`: [code i][cell p] =
    * ||c_i||² + 2·(cc_p,s · c_i). Driver-side, m·k·cells doubles
    * (public so the oracle generator can embed the same literals). */
  def residualConsts(coarse: Ivf.Model,
      book: IndexedSeq[IndexedSeq[Double]], s: Int,
      subDim: Int): IndexedSeq[IndexedSeq[Double]] =
    book.map { c =>
      coarse.centroids.map { cc =>
        val ccSub = cc.slice(s * subDim, (s + 1) * subDim)
        c.map(x => x * x).sum +
          2.0 * ccSub.zip(c).map { case (a, b) => a * b }.sum
      }
    }

  /** Nearest-residual-code for subspace `s` given the row's coarse cell:
    * ranks by const[i][cluster] − 2·v_sub·c_i; ties toward the lower
    * code, exactly like [[subCode]] and the oracle's CASE-over-least. */
  private def subCodeResidual(vd: Column, cluster: Column,
      coarse: Ivf.Model, book: IndexedSeq[IndexedSeq[Double]], s: Int,
      subDim: Int): Column = {
    val subv = slice(vd, s * subDim + 1, subDim)
    val cands = book.zipWithIndex.map { case (c, i) =>
      val consts = residualConsts(coarse, book, s, subDim)(i)
      struct(
        (element_at(typedLit(consts.toSeq), cluster + 1) -
          lit(2.0) * GraftFunctions.dot(subv, typedLit(c.toSeq))).as("d"),
        lit(i).as("c"))
    }
    array_min(array(cands: _*)).getField("c")
  }

  /** Train residual codebooks (one shared book set over ALL cells'
    * residuals — the standard memory/quality trade): [[fit]]'s
    * one-job-per-iteration Lloyd's, with assignment via the
    * constant-trick and means over x − centroid[cell][pos] (a literal
    * lookup, not a vector op). Init: residuals of the k lowest-id rows. */
  def fitResidual(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, m: Int = 8, k: Int = 16,
      iters: Int = 3): Model = {
    val vd = col(vecCol).cast("array<double>")
    val dim = coarse.centroids.head.size
    require(m > 0 && dim % m == 0,
      s"vector dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val withC = Ivf.withCluster(df.select(col(idCol), col(vecCol)), vecCol,
      coarse).select(col(idCol), vd.as("__v"), col("cluster"))
    val initRows = withC.orderBy(col(idCol)).limit(k)
      .select(col("__v"), col("cluster")).collect()
    var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map { s =>
        initRows.map { r =>
          val v = r.getSeq[Double](0)
          val cc = coarse.centroids(r.getInt(1))
          (s * sub until (s + 1) * sub).map(j => v(j) - cc(j)).toIndexedSeq
        }.toIndexedSeq
      }
    val flat = typedLit(coarse.centroids.flatten.toSeq)
    (1 to iters).foreach { _ =>
      val codes = array((0 until m).map(s =>
        subCodeResidual(col("__v"), col("cluster"), coarse, books(s), s,
          sub)): _*)
      val means = withC.withColumn("__c", codes)
        .select(col("__c"), col("cluster").as("__cell"),
          posexplode(col("__v")).as(Seq("pos", "x")))
        .select(
          (col("pos") / lit(sub)).cast("int").as("s"),
          element_at(col("__c"),
            (col("pos") / lit(sub)).cast("int") + 1).as("cluster"),
          pmod(col("pos"), lit(sub)).as("within"),
          (col("x") - element_at(flat,
            col("__cell") * lit(dim) + col("pos") + 1)).as("x"))
        .groupBy(col("s"), col("cluster"), col("within"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val grouped = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = (0 until m).map { s =>
        books(s).indices.map { c =>
          grouped.get((s, c)) match {
            case Some(rows) =>
              val arr = new Array[Double](sub)
              rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
              arr.toIndexedSeq
            case None => books(s)(c)
          }
        }.toIndexedSeq
      }.toIndexedSeq
    }
    Model(books)
  }

  /** Residual codes + coarse cell: (idCol, cluster, pq_code) in one
    * projection over the scan. */
  def encodeResidual(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, model: Model): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val code = Ivf.withCluster(df, vecCol, coarse)
    code.select(col(idCol), col("cluster"),
      model.codebooks.zipWithIndex.map { case (book, s) =>
        shiftleft(subCodeResidual(vd, col("cluster"), coarse, book, s,
          model.subDim).cast("long"), 8 * s)
      }.reduceLeft[Column](_ bitwiseOR _).as("pq_code"))
  }

  /** Materialize the residual index: (id, 8-byte code) partitioned by
    * coarse cell — same layout and probe contract as
    * [[writeIvfPqIndex]], but the codes now explain v − centroid. */
  def writeResidualIndex(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, model: Model, path: String): Unit =
    encodeResidual(df, idCol, vecCol, coarse, model)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Per-subspace ADC tables for every cell: [cell p][code i] =
    * ||(q − cc_p)_s − c_i||². The query's residual differs per probed
    * cell, so the lookup is indexed by (cluster, code) — still literal
    * arrays, still one codegen projection. */
  def residualAdcTables(coarse: Ivf.Model, model: Model,
      query: IndexedSeq[Double]): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    // [s][cell][code]
    (0 until model.m).map { s =>
      coarse.centroids.map { cc =>
        val qRes = query.indices.map(j => query(j) - cc(j))
        model.adcTable(qRes.toIndexedSeq)(s)
      }
    }

  /** ADC top-k against a [[writeResidualIndex]] table: partition-pruned
    * probe, per-cell literal ADC tables. Output: (idCol, cluster,
    * pq_code, adc_dist). */
  def adcTopKResidualIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, model: Model, coarse: Ivf.Model,
      query: IndexedSeq[Double], queryId: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = coarse.nearestClusters(query, nProbe)
    val tables = residualAdcTables(coarse, model, query)
    val dist = (0 until model.m).map { s =>
      element_at(
        element_at(typedLit(tables(s).map(_.toSeq).toSeq),
          col("cluster") + 1),
        (shiftright(col("pq_code"), 8 * s).bitwiseAND(lit(255L)))
          .cast("int") + 1)
    }.reduceLeft[Column](_ + _)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"), col("pq_code"),
        dist.as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** Exactly-once streaming index ingest: drain whatever vectors are NEW
    * in `srcDir` (AvailableNow), encode scan-side to (id, packed code,
    * coarse cell), and append to a [[writeIvfPqIndex]]-layout table.
    * File-source progress lives in the checkpoint, so a re-drain never
    * re-encodes processed vectors — index maintenance cost tracks NEW
    * embeddings, not corpus size, which is what keeps a continuously-fed
    * ANN index viable at 100 TB. The sink's partitionBy("cluster")
    * preserves the probe-side partition pruning contract; fold small
    * per-drain files with Maintenance.compact when drains are frequent. */
  def encodeIngestOnce(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      destDir: String, checkpointDir: String, idCol: String, vecCol: String,
      coarse: Ivf.Model, model: Model): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = Ivf.withCluster(stream, vecCol, coarse)
      .select(col(idCol), codeColumn(col(vecCol), model).as("pq_code"),
        col("cluster"))
      .writeStream
      .format("parquet")
      .partitionBy("cluster")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** ADC top-`candidates` then EXACT rerank — the production IVF-PQ
    * "refine" stage: the coarse 8-byte-code pass prunes a billion rows
    * to `candidates`, and only those rows' full vectors are fetched
    * (a broadcast-sized semi join against the candidate id set) and
    * scored exactly. Quantization error then only costs recall when a
    * true neighbor falls outside the candidate pool, so a 10–50×
    * candidate multiplier buys back most of what the codes lose.
    * Output: (idCol, l2sq) ranked exact-ascending. */
  def topKRefined(df: DataFrame, idCol: String, vecCol: String,
      model: Model, query: IndexedSeq[Double], queryId: Long, k: Int,
      candidates: Int): DataFrame = {
    require(candidates >= k, s"candidates $candidates must be >= k $k")
    val cand = adcTopK(encode(df, idCol, vecCol, model), idCol, model,
      query, queryId, candidates).select(col(idCol))
    val vd = col(vecCol).cast("array<double>")
    df.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        (GraftFunctions.dot(vd, vd) -
          lit(2.0) * GraftFunctions.dot(vd, typedLit(query.toSeq)) +
          lit(query.map(x => x * x).sum)).as("l2sq"))
      .orderBy(col("l2sq"), col(idCol))
      .limit(k)
  }
}
