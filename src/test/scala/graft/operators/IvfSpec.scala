package graft.operators

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated directions + jitter; ids interleaved across
  // clusters so the deterministic init sees all three.
  private def corpus = {
    def v(base: Array[Double], eps: Double) =
      base.zipWithIndex.map { case (x, i) => (x + (if (i % 2 == 0) eps else -eps)).toFloat }.toSeq
    val a = Array.fill(16)(1.0)
    val b = Array.tabulate(16)(i => if (i < 8) 1.0 else -1.0)
    val c = Array.fill(16)(-1.0)
    Seq(
      (0L, v(a, 0.01), "a"), (1L, v(b, 0.01), "b"), (2L, v(c, 0.01), "c"),
      (3L, v(a, 0.02), "a"), (4L, v(b, 0.02), "b"), (5L, v(c, 0.02), "c"),
      (6L, v(a, 0.03), "a"), (7L, v(b, 0.03), "b"), (8L, v(c, 0.03), "c")
    ).toDF("vec_id", "embedding", "truth")
  }

  test("fit + assign recovers the planted clusters") {
    val m = Ivf.fit(corpus, "vec_id", "embedding", k = 3, iters = 4)
    val assigned = Ivf.assign(corpus, "vec_id", "embedding", m)
      .join(corpus.select("vec_id", "truth"), Seq("vec_id"))
      .collect().map(r => r.getAs[String]("truth") -> r.getAs[Int]("cluster"))
    val byTruth = assigned.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    // each planted group lands wholly in one distinct cell
    assert(byTruth.values.forall(_.size == 1))
    assert(byTruth.values.flatten.toSet.size == 3)
  }

  test("fitSample: deterministic across layouts, bounded, identity " +
      "under the bound, and fit-able") {
    val big = (0 until 2000).map { i =>
      (i.toLong, Seq.tabulate(16)(j =>
        (math.sin(i * 0.37 + j) * (1 + i % 3)).toFloat))
    }.toDF("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val s3 = ids(Ivf.fitSample(big.repartition(3), "vec_id", 300L))
    val s13 = ids(Ivf.fitSample(big.repartition(13), "vec_id", 300L))
    assert(s3 == s13, "sample must not depend on partitioning")
    assert(s3.size > 200 && s3.size < 420,
      s"hash-threshold sample should land near the bound: ${s3.size}")
    // identity under the bound — no row dropped, no extra scan effects
    assert(ids(Ivf.fitSample(big, "vec_id", 10000L)) == ids(big))
    // the sampled fit yields a complete usable model for the FULL corpus
    val m = Ivf.fit(Ivf.fitSample(big, "vec_id", 300L),
      "vec_id", "embedding", k = 4, iters = 2)
    assert(m.k == 4 && m.centroids.forall(_.length == 16))
    assert(Ivf.assign(big, "vec_id", "embedding", m).count() == 2000L)
  }

  test("assign is a pure projection: no window, no join, no exchange, " +
      "and it rides the fused nearest-cell expression") {
    val m = Ivf.fit(corpus, "vec_id", "embedding", k = 3, iters = 2)
    val plan = Ivf.assign(corpus, "vec_id", "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Join"), s"join in plan:\n$plan")
    assert(!plan.contains("Exchange"), s"exchange in plan:\n$plan")
    // the matrix-in-references form, not per-centroid unrolled literals
    // (which recompiled a fresh codegen unit per k-means iteration).
    // Checked on the ANALYZED plan: over this local-relation corpus the
    // optimizer constant-folds the whole projection into a
    // LocalTableScan (itself proof the expression evaluates interpreted).
    val analyzed = Ivf.assign(corpus, "vec_id", "embedding", m)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("graft_nearest_cell"),
      s"fused expr missing:\n$analyzed")
  }

  test("fitSample plans as a scan-side filter: no exchange, no sort") {
    val big = (0 until 500).map(i =>
      (i.toLong, Seq.tabulate(8)(j => (i * 0.1f + j)))).toDF("vec_id", "embedding")
    val plan = Ivf.fitSample(big, "vec_id", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"exchange in plan:\n$plan")
    assert(!plan.contains("Sort"), s"sort in plan:\n$plan")
  }

  test("materialized index: topKIndexed prunes to probed cells, same result") {
    val m = Ivf.fit(corpus, "vec_id", "embedding", k = 3, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Ivf.writeIndex(corpus, "embedding", m, path)
    val q = corpus.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).collect()
      .head.getSeq[Double](0).toIndexedSeq
    val probes = m.nearestClusters(q, 1).toSet
    val idx = Ivf.topKIndexed(spark, path, "vec_id", "embedding", q, m,
      queryId = 0L, k = 2, nProbe = 1)
    // the cluster isin-filter lands on the partition column: only the
    // probed cell's files are read
    val plan = idx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on cluster (probes=$probes):\n$plan")
    val direct = Ivf.topK(corpus, "vec_id", "embedding", m, queryId = 0L,
      k = 2, nProbe = 1).rows.map(r => (r.getLong(0), r.getDouble(2)))
    assert(idx.rows.map(r => (r.getLong(0), r.getDouble(2))) == direct)
  }

  test("quantized index: pruned probe, ranking survives quantization") {
    val m = Ivf.fit(corpus, "vec_id", "embedding", k = 3, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("qivf-idx").toString
    Ivf.writeQuantizedIndex(corpus, "vec_id", "embedding", m, path)
    val q = corpus.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).collect()
      .head.getSeq[Double](0).toIndexedSeq
    val idx = Ivf.quantizedTopKIndexed(spark, path, "vec_id", q, m,
      queryId = 0L, k = 2, nProbe = 1)
    val plan = idx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on cluster:\n$plan")
    // same probed cell, same neighbors as the float index; scores within
    // the quantization error bound
    val direct = Ivf.topK(corpus, "vec_id", "embedding", m, queryId = 0L,
      k = 2, nProbe = 1).rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val quant = idx.rows.map(r => r.getLong(0) -> r.getDouble(2))
    assert(quant.map(_._1).toSet == direct.keySet)
    assert(quant.forall { case (id, c) => math.abs(direct(id) - c) < 0.02 })
  }

  test("topK probes the query's cell and ranks by cosine") {
    val m = Ivf.fit(corpus, "vec_id", "embedding", k = 3, iters = 4)
    val out = Ivf.topK(corpus, "vec_id", "embedding", m, queryId = 0L,
      k = 2, nProbe = 1).rows
    assert(out.map(_.getLong(0)).toSet == Set(3L, 6L)) // same planted cluster
    assert(out.forall(_.getDouble(2) > 0.99))
  }
}
