package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into k centroid cells, search only the `nProbe` cells nearest the query
  * — the standard scale path when sign-LSH recall is not enough.
  *
  * The centroid model is tiny (k × dim doubles) and lives on the driver;
  * assignment is a broadcast join + codegen'd distance expressions + one
  * window rank. At corpus scale, writing the table partitioned/bucketed by
  * `cluster` turns probing into partition pruning. */
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

  private def centroidDf(df: DataFrame, m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    m.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "__cvec")
  }

  /** Squared L2 distance ||v||² − 2·v·c + ||c||², from codegen'd dots. */
  private def distSq(v: Column, c: Column): Column =
    GraftFunctions.dot(v, v) - lit(2.0) * GraftFunctions.dot(v, c) +
      GraftFunctions.dot(c, c)

  /** Assign every vector to its nearest centroid: broadcast the centroid
    * table, one distance per (vector, centroid), window-rank per vector.
    * Output: (idCol, cluster). */
  def assign(df: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    val w = Window.partitionBy(col(idCol)).orderBy(col("__d"), col("cluster"))
    df.select(col(idCol), vd.as("__v"))
      .crossJoin(broadcast(centroidDf(df, m)))
      .select(col(idCol), col("cluster"), distSq(col("__v"), col("__cvec")).as("__d"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster"))
  }

  /** Lloyd's k-means with deterministic init (the k lowest-id vectors) and
    * a fixed iteration count. Centroid means are computed distributed
    * (posexplode → per-(cluster, position) average) and collected — k × dim
    * doubles per round. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5): Model = {
    val vd = col(vecCol).cast("array<double>")
    var model = Model(
      df.orderBy(col(idCol)).limit(k)
        .select(vd.as("__v")).collect()
        .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq)
    (1 to iters).foreach { _ =>
      val assigned = assign(df, idCol, vecCol, model)
      val means = df.select(col(idCol), vd.as("__v"))
        .join(assigned, Seq(idCol))
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
    * by cosine inside them — the scan touches ~nProbe/k of the corpus. */
  def topK(df: DataFrame, idCol: String, vecCol: String, m: Model,
      queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
      .head.getSeq[Double](0).toIndexedSeq
    val probes = m.nearestClusters(q, nProbe)
    val assigned = assign(df, idCol, vecCol, m)
    df.join(assigned, Seq(idCol))
      .filter(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), col("cluster"),
        GraftFunctions.cosine(col(vecCol), typedLit(q.toSeq)).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
