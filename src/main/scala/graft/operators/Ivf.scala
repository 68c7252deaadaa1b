package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into k centroid cells, search only the `nProbe` cells nearest the query
  * — the standard scale path when sign-LSH recall is not enough.
  *
  * The centroid model is tiny (k × dim doubles) and lives on the driver,
  * so nearest-centroid assignment needs no join at all: the k distances
  * fold into ONE codegen'd projection per row (array of (dist, cluster)
  * structs → array_min → argmin). No explode to N×k rows, no window, no
  * shuffle. At corpus scale, [[writeIndex]] materializes the assignment
  * once per model as a cluster-partitioned table and [[topKIndexed]]
  * probes it with partition pruning — the scan reads ~nProbe/k of the
  * files instead of re-deriving assignments per query. */
object Ivf {

  final case class Model(centroids: IndexedSeq[IndexedSeq[Double]]) {
    def k: Int = centroids.size
    /** Clusters sorted by squared L2 distance to the query vector. */
    def nearestClusters(q: IndexedSeq[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, l2sq(c, q)) }
        .sortBy { case (i, d) => (d, i) }
        .take(nProbe).map(_._1)
  }

  private def l2sq(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid id for a double-array column, as a single codegen'd
    * projection. Ranks by ||c||² − 2·v·c — the ||v||² term is constant per
    * row so it cancels in the argmin; ||c||² is folded on the driver.
    * Ties break toward the lower cluster id. The centroid matrix rides
    * in the codegen REFERENCES ([[GraftFunctions.nearestCell]]), so
    * every k-means iteration reuses ONE cached codegen unit instead of
    * Janino-compiling a fresh unrolled-literal monster per iteration —
    * the dominant cost of [[fit]] at small scale, and a codegen-cache
    * polluter at any scale. */
  private def nearestCluster(vd: Column, m: Model): Column = {
    val dim = m.centroids.headOption.map(_.length).getOrElse(0)
    require(m.centroids.forall(_.length == dim),
      "ragged centroid matrix")
    // null vector → cluster 0, not a NULL cluster: a null embedding must
    // land in a real partition of the index (and the pre-NearestCellId
    // unrolled argmin resolved nulls to 0 — behavior is pinned)
    coalesce(
      GraftFunctions.nearestCell(vd, m.centroids.flatten.toArray, m.k, dim),
      lit(0))
  }

  /** Add the nearest-centroid cell as a `cluster` column — a pure
    * projection over the scan, nothing else. The name is part of the index
    * contract ([[writeIndex]] partitions by it), so a pre-existing
    * `cluster` column is rejected instead of silently overwritten. */
  def withCluster(df: DataFrame, vecCol: String, m: Model): DataFrame = {
    require(!df.columns.contains("cluster"),
      "input already has a 'cluster' column; rename it before IVF assignment")
    df.withColumn("cluster",
      nearestCluster(col(vecCol).cast("array<double>"), m))
  }

  /** Assign every vector to its nearest centroid. Output: (idCol, cluster). */
  def assign(df: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame =
    withCluster(df, vecCol, m).select(col(idCol), col("cluster"))

  /** Materialize the assignment once per model: the corpus written
    * partitioned by cluster, so every later probe is partition pruning
    * instead of a recomputed assignment (SCALING.md's prescription). */
  def writeIndex(df: DataFrame, vecCol: String, m: Model, path: String): Unit =
    withCluster(df, vecCol, m)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** [[writeIndex]] with int8-binary vectors (the IVF analog of
    * [[Similarity.writeQuantizedLshIndex]]): cluster partition pruning AND
    * each probed file a quarter the bytes — dense BINARY, because parquet
    * stores array<tinyint> elements as INT32. */
  def writeQuantizedIndex(df: DataFrame, idCol: String, vecCol: String,
      m: Model, path: String): Unit =
    withCluster(df, vecCol, m)
      .select(col(idCol),
        GraftFunctions.quantizeInt8Binary(col(vecCol).cast("array<double>"))
          .as("q8"),
        col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Probe-limited top-k against a [[writeQuantizedIndex]] table: the
    * query is quantized with the same scalar contract and scored against
    * the int8 binary corpus in one fused loop. */
  def quantizedTopKIndexed(spark: SparkSession, path: String, idCol: String,
      query: IndexedSeq[Double], m: Model, queryId: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = m.nearestClusters(query, nProbe)
    val qq = VectorQuant.quantizeVec(query).map(_.toByte).toArray
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"),
        GraftFunctions.cosineInt8(col("q8"), typedLit(qq)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Bounded deterministic fit set — the corpus-scale k-means contract
    * made concrete: centroid quality needs a representative SAMPLE, not
    * the corpus (standard practice is fitting on O(100·k) vectors), so
    * at 100 TB the fit loop should scan `maxVectors` rows, not the
    * table, while encoding stays a single full-corpus projection.
    * Sampling is [[Sampling.deterministicSample]]'s hash-threshold on
    * the id — the same rows at any parallelism or file layout, so a
    * re-fit on unchanged data reproduces the model bit-for-bit (no RNG,
    * no zipWithIndex). Under the bound the input passes through
    * unchanged. One count() scan decides the fraction; on a real
    * deployment that statistic comes from table metadata. */
  def fitSample(df: DataFrame, idCol: String, maxVectors: Long): DataFrame = {
    require(maxVectors > 0, "maxVectors must be positive")
    val n = df.count()
    if (n <= maxVectors) df
    else Sampling.deterministicSample(df, idCol, maxVectors.toDouble / n)
  }

  /** Lloyd's k-means with deterministic init (the k lowest-id vectors) and
    * a fixed iteration count. Per round: one projection (assignment) + one
    * posexplode aggregation; k × dim doubles collected. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5): Model = {
    val vd = col(vecCol).cast("array<double>")
    var model = Model(
      df.orderBy(col(idCol)).limit(k)
        .select(vd.as("__v")).collect()
        .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq)
    (1 to iters).foreach { _ =>
      val means = df.select(vd.as("__v"))
        .withColumn("cluster", nearestCluster(col("__v"), model))
        .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      model = Model(model.centroids.indices.map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr.toIndexedSeq
          case None => model.centroids(c) // empty cluster keeps its centroid
        }
      }.toIndexedSeq)
    }
    model
  }

  /** IVF top-k: probe the `nProbe` cells nearest the query vector and rank
    * by cosine inside them. Assignment is inlined as a projection (no
    * join); the cluster filter sits directly on the scan. */
  def topK(df: DataFrame, idCol: String, vecCol: String, m: Model,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
      .head.getSeq[Double](0).toIndexedSeq
    val probes = m.nearestClusters(q, nProbe)
    withCluster(df, vecCol, m)
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"),
        GraftFunctions.cosine(col(vecCol), typedLit(q.toSeq)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Top-k against a materialized [[writeIndex]] table: the `cluster`
    * isin-filter lands on the partition column, so only the probed cells'
    * files are read. */
  def topKIndexed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, query: IndexedSeq[Double], m: Model,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val probes = m.nearestClusters(query, nProbe)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"),
        GraftFunctions.cosine(col(vecCol), typedLit(query.toSeq)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
