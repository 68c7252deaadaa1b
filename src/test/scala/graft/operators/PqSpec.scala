package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // Two planted directions per subspace half, jittered — small but with
  // genuine subspace structure so 2-centroid books separate it.
  private def corpus = {
    def v(s: Double, eps: Double) =
      Array.tabulate(8)(i => (if (i < 4) s else -s) + eps * (i + 1)).map(_.toFloat).toSeq
    Seq(
      (0L, v(1.0, 0.001)), (1L, v(-1.0, 0.001)),
      (2L, v(1.0, 0.002)), (3L, v(-1.0, 0.002)),
      (4L, v(1.0, 0.003)), (5L, v(-1.0, 0.003))
    ).toDF("vec_id", "embedding")
  }

  test("fit shapes: m books of k centroids over dim/m slices") {
    val m = Pq.fit(corpus, "vec_id", "embedding", m = 2, k = 2, iters = 3)
    assert(m.m == 2 && m.k == 2 && m.subDim == 4)
    assert(m.codebooks.forall(_.forall(_.length == 4)))
  }

  test("packed code lanes equal the per-subspace argmin; encode is a pure projection") {
    val m = Pq.fit(corpus, "vec_id", "embedding", m = 2, k = 2, iters = 3)
    val enc = Pq.encode(corpus, "vec_id", "embedding", m)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"encode must be a projection:\n$plan")
    val codes = enc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute each lane locally from the codebooks
    val vecs = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- vecs) {
      val expect = m.codebooks.zipWithIndex.map { case (book, s) =>
        val sub = v.slice(s * m.subDim, (s + 1) * m.subDim)
        val best = book.zipWithIndex.map { case (c, i) =>
          val d = sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, i)
        }.min
        best._2.toLong << (8 * s)
      }.sum
      assert(codes(id) == expect, s"code mismatch for vec $id")
    }
  }

  test("adcTopK equals a local exact recomputation over the codes") {
    val m = Pq.fit(corpus, "vec_id", "embedding", m = 2, k = 2, iters = 3)
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toIndexedSeq
    val got = Pq.topK(corpus, "vec_id", "embedding", m, q, 0L, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val table = m.adcTable(q)
    val codes = Pq.encode(corpus, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = codes.removed(0L).toSeq.map { case (id, code) =>
      val d = table.zipWithIndex.map { case (tb, s) =>
        tb(((code >> (8 * s)) & 255L).toInt)
      }.reduceLeft(_ + _)
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(3)
    assert(got.map(_._1).toSeq == local.map(_._1))
    got.zip(local).foreach { case ((_, a), (_, b)) =>
      assert(a == b, s"ADC distance drifted: $a vs $b")
    }
  }

  test("topK plan is scan -> projection -> TakeOrderedAndProject") {
    val m = Pq.fit(corpus, "vec_id", "embedding", m = 2, k = 2, iters = 2)
    val q = IndexedSeq.fill(8)(0.5)
    val plan = Pq.topK(corpus, "vec_id", "embedding", m, q, 0L, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
  }

  test("packing guard: m > 8 or k > 256 refuses") {
    intercept[IllegalArgumentException] {
      Pq.Model(IndexedSeq.fill(9)(IndexedSeq(IndexedSeq(0.0))))
    }
  }

  test("IVF-PQ index: probe prunes to probed cells; ADC matches unpruned within them") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val coarse = Ivf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-spec-").toString
    try {
      Pq.writeIvfPqIndex(emb, "vec_id", "embedding", coarse, model, dir)
      val probe = Pq.adcTopKIndexed(spark, dir, "vec_id", model, coarse,
        q, queryId = 0L, k = 5, nProbe = 2)
      val plan = probe.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).nonEmpty,
        s"probe must prune on the cluster partition column:\n$plan")
      // ground truth: unindexed ADC restricted to the probed cells
      val probes = coarse.nearestClusters(q, 2).toSet
      val cells = Ivf.assign(emb, "vec_id", "embedding", coarse)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val local = Pq.adcTopK(Pq.encode(emb, "vec_id", "embedding", model),
          "vec_id", model, q, 0L, Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
        .filter { case (id, _) => probes(cells(id)) }.take(5)
      val got = probe.collect().map(r => (r.getLong(0), r.getDouble(3)))
      assert(got.toSeq == local.toSeq,
        s"indexed probe drifted: ${got.toSeq} vs ${local.toSeq}")
      // refine: exact rerank only over candidate ids, exact-L2 scored
      val ref = Pq.topKRefinedIndexed(spark, dir, emb, "vec_id",
          "embedding", model, coarse, q, 0L, k = 3, candidates = 5,
          nProbe = 2)
        .collect().map(_.getLong(0)).toSeq
      val candidateIds = local.map(_._1).toSet
      assert(ref.toSet.subsetOf(candidateIds),
        "refined results must come from the ADC candidate pool")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("batched concurrent probes == the sequential probe loop") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val coarse = Ivf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-many-").toString
    try {
      Pq.writeIvfPqIndex(emb, "vec_id", "embedding", coarse, model, dir)
      val queries = emb.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).toSeq
      assert(queries.size >= 3)
      val batched = Pq.topKRefinedIndexedMany(spark, dir, emb, "vec_id",
        "embedding", model, coarse, queries, k = 3, candidates = 6,
        nProbe = 2, parallelism = 4)
      val sequential = queries.map { case (qid, q) =>
        qid -> Pq.topKRefinedIndexed(spark, dir, emb, "vec_id", "embedding",
            model, coarse, q, qid, k = 3, candidates = 6, nProbe = 2)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }.toMap
      assert(batched == sequential,
        "concurrent submission must not change any probe's result")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("streaming encode ingest: two drains == batch index; re-drain is a no-op") {
    val emb = corpus.cache()
    val coarse = Ivf.fit(emb, "vec_id", "embedding", k = 2, iters = 2)
    val model = Pq.fit(emb, "vec_id", "embedding", m = 2, k = 2, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("pq-stream-").toString
    val src = s"$root/src"; val dest = s"$root/idx"; val ckpt = s"$root/ckpt"
    try {
      val schema = emb.schema
      emb.filter(col("vec_id") < 3L).write.mode("append").parquet(src)
      Pq.encodeIngestOnce(spark, src, schema, dest, ckpt,
        "vec_id", "embedding", coarse, model)
      emb.filter(col("vec_id") >= 3L).write.mode("append").parquet(src)
      Pq.encodeIngestOnce(spark, src, schema, dest, ckpt,
        "vec_id", "embedding", coarse, model)
      // streamed index content == one-shot batch encode + assignment
      val streamed = spark.read.parquet(dest)
        .select("vec_id", "pq_code", "cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = Ivf.withCluster(emb, "embedding", coarse)
        .select(col("vec_id"),
          Pq.codeColumn(col("embedding"), model).as("pq_code"),
          col("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch)
      // exactly-once: a drain with nothing new appends nothing
      Pq.encodeIngestOnce(spark, src, schema, dest, ckpt,
        "vec_id", "embedding", coarse, model)
      assert(spark.read.parquet(dest).count() == 6L)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  test("residual codes equal a local residual-argmin replay; indexed probe matches") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val coarse = Ivf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val model = Pq.fitResidual(emb, "vec_id", "embedding", coarse,
      m = 4, k = 8, iters = 2)
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cells = Ivf.assign(emb, "vec_id", "embedding", coarse)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sub = model.subDim
    def localCode(id: Long): Long = {
      val v = vecs(id); val cc = coarse.centroids(cells(id))
      val r = v.indices.map(j => v(j) - cc(j))
      model.codebooks.zipWithIndex.map { case (book, s) =>
        val rs = r.slice(s * sub, (s + 1) * sub)
        book.zipWithIndex.map { case (c, i) =>
          (rs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
        }.min._2.toLong << (8 * s)
      }.sum
    }
    val enc = Pq.encodeResidual(emb, "vec_id", "embedding", coarse, model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    enc.foreach { case (id, cell, code) =>
      assert(cell == cells(id))
      assert(code == localCode(id), s"residual code drift for vec $id")
    }
    // indexed probe: pruned scan, per-cell ADC tables, local cross-check
    val dir = java.nio.file.Files.createTempDirectory("respq-spec-").toString
    try {
      Pq.writeResidualIndex(emb, "vec_id", "embedding", coarse, model, dir)
      val q = vecs(0L).toIndexedSeq
      val probe = Pq.adcTopKResidualIndexed(spark, dir, "vec_id", model,
        coarse, q, queryId = 0L, k = 5, nProbe = 2)
      val plan = probe.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).nonEmpty,
        s"residual probe must prune on cluster:\n$plan")
      val probes = coarse.nearestClusters(q, 2).toSet
      val tables = Pq.residualAdcTables(coarse, model, q)
      val local = enc.filter { case (id, cell, _) =>
          id != 0L && probes(cell)
        }.map { case (id, cell, code) =>
          val d = (0 until model.m).map { s =>
            tables(s)(cell)(((code >> (8 * s)) & 255L).toInt)
          }.reduceLeft(_ + _)
          (id, d)
        }.sortBy { case (id, d) => (d, id) }.take(5)
      val got = probe.collect().map(r => (r.getLong(0), r.getDouble(3)))
      assert(got.toSeq == local.toSeq,
        s"residual probe drifted: ${got.toSeq} vs ${local.toSeq}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("PQ recall@10 vs exact-L2 truth on sf0.01 embeddings >= floor") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .cache()
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val codes = Pq.encode(emb, "vec_id", "embedding", model).cache()
    val vd = col("embedding").cast("array<double>")
    val qvecs = emb.select(col("vec_id"), vd)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap
    val k = 10
    val queryIds = (0L until 500L by 25L).toSeq
    def recallOf(got: Long => Set[Long]): Double = {
      val rs = queryIds.map { qid =>
        val q = qvecs(qid)
        // exact L2 truth: rank by ||v||² − 2·v·q (||q||² constant)
        val truth = emb.filter(col("vec_id") =!= qid)
          .select(col("vec_id"),
            (graft.expressions.GraftFunctions.dot(vd, vd) - lit(2.0) *
              graft.expressions.GraftFunctions.dot(vd, typedLit(q.toSeq)))
              .as("d"))
          .orderBy(col("d"), col("vec_id")).limit(k)
          .collect().map(_.getLong(0)).toSet
        (truth intersect got(qid)).size.toDouble / k
      }
      rs.sum / rs.size
    }
    val adc = recallOf(qid => Pq.adcTopK(codes, "vec_id", model,
      qvecs(qid), qid, k).collect().map(_.getLong(0)).toSet)
    val refined = recallOf(qid => Pq.topKRefined(emb, "vec_id",
        "embedding", model, qvecs(qid), qid, k, candidates = 100)
      .collect().map(_.getLong(0)).toSet)
    // residual encoding, FULL probe (nProbe = all cells) so the number
    // isolates code quality from cell-miss recall loss
    val coarse = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val resModel = Pq.fitResidual(emb, "vec_id", "embedding", coarse,
      m = 8, k = 16, iters = 3)
    val resCodes = Pq.encodeResidual(emb, "vec_id", "embedding", coarse,
      resModel).cache()
    def residualRecall(nProbe: Int): Double = recallOf { qid =>
      val q = qvecs(qid)
      val probes = coarse.nearestClusters(q, nProbe).toSet
      val tables = Pq.residualAdcTables(coarse, resModel, q)
      resCodes.collect().iterator
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .filter { case (id, cell, _) => id != qid && probes(cell) }
        .map { case (id, cell, code) =>
          (id, (0 until resModel.m).map { s =>
            tables(s)(cell)(((code >> (8 * s)) & 255L).toInt)
          }.sum)
        }.toSeq.sortBy { case (id, d) => (d, id) }.take(k)
        .map(_._1).toSet
    }
    val resFull = residualRecall(8)
    info(f"pq(8x16) recall@10 vs exact L2: adc=$adc%.3f refined(c=100)=$refined%.3f residual(full-probe)=$resFull%.3f")
    // measured: adc=0.315, refined=0.860, residual=? — floors absorb
    // fixture regeneration, not regressions (AnnRecallSpec discipline)
    assert(adc >= 0.2, f"pure-ADC recall collapsed: $adc%.3f")
    assert(refined >= 0.75, f"refined recall collapsed: $refined%.3f")
    assert(resFull >= adc,
      f"residual codes must not be worse than raw codes: $resFull%.3f vs $adc%.3f")
  }
}
