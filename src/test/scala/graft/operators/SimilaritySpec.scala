package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c.as("v")).rows.head

  test("cosine of identical / orthogonal / opposite vectors") {
    val a = typedLit(Seq(1.0, 0.0, 2.0))
    val b = typedLit(Seq(0.0, 3.0, 0.0))
    assert(math.abs(one(Similarity.cosine(a, a)).getDouble(0) - 1.0) < 1e-15)
    assert(one(Similarity.cosine(a, b)).getDouble(0) == 0.0)
    val negA = typedLit(Seq(-1.0, 0.0, -2.0))
    assert(math.abs(one(Similarity.cosine(a, negA)).getDouble(0) + 1.0) < 1e-15)
  }

  test("bruteForceTopK returns k rows ranked by cosine") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest
      (2L, Seq(0.0f, 1.0f)),   // orthogonal
      (3L, Seq(-1.0f, 0.0f)),  // opposite
      (4L, Seq(0.7f, 0.7f))    // diagonal
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3).rows
    assert(out.map(_.getLong(0)) == Seq(1L, 4L, 2L))
    assert(out.head.getDouble(1) > 0.99)
  }

  test("lshBucket: same direction -> same bucket, opposite -> complement") {
    val planes = Similarity.hyperplanes(8, 4)
    val v = typedLit(Seq(0.3, -0.2, 0.9, 0.1))
    val scaled = typedLit(Seq(0.6, -0.4, 1.8, 0.2))
    val opposite = typedLit(Seq(-0.3, 0.2, -0.9, -0.1))
    val bv = one(Similarity.lshBucket(v, planes)).getLong(0)
    val bs = one(Similarity.lshBucket(scaled, planes)).getLong(0)
    val bo = one(Similarity.lshBucket(opposite, planes)).getLong(0)
    assert(bv == bs)
    assert((bv ^ bo) == 255L) // all 8 sign bits flip
  }

  test("hyperplanes are deterministic for a fixed seed") {
    assert(Similarity.hyperplanes(4, 8) == Similarity.hyperplanes(4, 8))
  }

  test("lshTopK finds the nearest vector when it shares the bucket") {
    val base = Seq.fill(64)(0.5)
    val near = base.updated(0, 0.51)
    val far = base.map(-_)
    val vecs = Seq(
      (0L, base.map(_.toFloat)),
      (1L, near.map(_.toFloat)),
      (2L, far.map(_.toFloat))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding", 0L, 2,
      numPlanes = 8, dim = 64).rows
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getDouble(1) > 0.999)
  }

  test("materialized LSH index: partition-pruned probe, same result as lshTopK") {
    val base = Seq.fill(64)(0.5)
    val vecs = Seq(
      (0L, base.map(_.toFloat)),
      (1L, base.updated(0, 0.51).map(_.toFloat)),
      (2L, base.map(-_).map(_.toFloat)),
      (3L, base.updated(1, 0.7).map(_.toFloat))
    ).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("lsh-idx").toString
    Similarity.writeLshIndex(vecs, "embedding", path, numPlanes = 8, dim = 64)
    val qRow = vecs.filter(col("vec_id") === 0L).select(
      col("embedding").cast("array<double>"),
      Similarity.lshBucket(col("embedding"), Similarity.hyperplanes(8, 64)))
      .rows.head
    val idx = Similarity.lshTopKIndexed(spark, path, "vec_id", "embedding",
      qRow.getSeq[Double](0), qRow.getLong(1), queryId = 0L, k = 2,
      numPlanes = 8)
    // the bucket isin-filter lands on the partition column
    val plan = idx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on bucket:\n$plan")
    val direct = Similarity.lshTopK(vecs, "vec_id", "embedding", 0L, 2,
      numPlanes = 8, dim = 64).rows.map(r => (r.getLong(0), r.getDouble(1)))
    assert(idx.rows.map(r => (r.getLong(0), r.getDouble(1))) == direct)
  }

  test("multi-table LSH index: partition-pruned probe, dedups across tables") {
    val base = Seq.fill(64)(0.5)
    val vecs = Seq(
      (0L, base.map(_.toFloat)),
      (1L, base.updated(0, 0.51).map(_.toFloat)), // near 0: in every table
      (2L, base.map(-_).map(_.toFloat)),
      (3L, base.updated(1, 0.7).map(_.toFloat))
    ).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("mlsh-idx").toString
    Similarity.writeMultiLshIndex(vecs, "embedding", path,
      tables = 4, numPlanes = 4, dim = 64)
    val q = vecs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).rows.head
      .getSeq[Double](0)
    val idx = Similarity.multiLshTopKIndexed(spark, path, "vec_id",
      "embedding", q, queryId = 0L, k = 3, tables = 4, numPlanes = 4,
      dim = 64)
    // the OR of per-table probes sits entirely on partition columns
    val plan = idx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*htable".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on (htable, bucket):\n$plan")
    val out = idx.rows.map(_.getLong(0))
    // vec 1 collides with the query in every table; it must appear ONCE
    assert(out.count(_ == 1L) == 1)
    assert(out.head == 1L) // nearest neighbor ranked first
  }

  test("quantized LSH index: pruned probe, smaller files, ranking survives") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qPath = java.nio.file.Files.createTempDirectory("qlsh-idx").toString
    val fPath = java.nio.file.Files.createTempDirectory("flsh-idx").toString
    Similarity.writeQuantizedLshIndex(vecs, "vec_id", "embedding", qPath,
      numPlanes = 8, dim = 64)
    Similarity.writeLshIndex(vecs, "embedding", fPath, numPlanes = 8, dim = 64)
    def bytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(f => f.toString.endsWith(".parquet"))
          .map(_.toFile.length()).sum
      } finally s.close()
    }
    // Footprint check on like-for-like single files (the partitioned
    // index at this toy scale is per-file-footer-dominated): dense binary
    // int8 must beat the float arrays by well over 2x on incompressible
    // data. This is exactly why q8 is BINARY — array<tinyint> stores
    // INT32 per element in parquet and measured ~1:1 against float here.
    val colQ = java.nio.file.Files.createTempDirectory("qcol").toString + "/q"
    val colF = java.nio.file.Files.createTempDirectory("fcol").toString + "/f"
    vecs.select(graft.expressions.GraftFunctions
        .quantizeInt8Binary(col("embedding").cast("array<double>")).as("q8"))
      .coalesce(1).write.parquet(colQ)
    vecs.select(col("embedding")).coalesce(1).write.parquet(colF)
    assert(bytes(colQ) < bytes(colF) * 0.45,
      s"quantized=${bytes(colQ)} float=${bytes(colF)}")
    val qRow = vecs.filter(col("vec_id") === 0L).select(
      col("embedding").cast("array<double>"),
      Similarity.lshBucket(col("embedding"), Similarity.hyperplanes(8, 64)))
      .rows.head
    val idx = Similarity.quantizedLshTopKIndexed(spark, qPath, "vec_id",
      qRow.getSeq[Double](0), qRow.getLong(1), queryId = 0L, k = 5,
      numPlanes = 8)
    val plan = idx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on bucket:\n$plan")
    // quantized ranking tracks the float ranking: same probe set, so the
    // quantized top-5 sits inside the float top-10 with scores within the
    // quantization error bound (rank swaps possible only at ~0.01 gaps)
    val floatIdx = Similarity.lshTopKIndexed(spark, fPath, "vec_id",
        "embedding", qRow.getSeq[Double](0), qRow.getLong(1), queryId = 0L,
        k = 10, numPlanes = 8)
      .rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = idx.rows.map(r => r.getLong(0) -> r.getDouble(1))
    assert(quant.forall { case (id, c) =>
      floatIdx.contains(id) && math.abs(floatIdx(id) - c) < 0.02 },
      s"quant=$quant float=$floatIdx")
  }

  test("topKJoin returns k nearest per query via bucketed candidates") {
    val base = (1 to 64).map(i => math.sin(i.toDouble))
    def jitter(eps: Double) = base.map(v => (v + eps).toFloat)
    val corpus = Seq(
      (10L, jitter(0.01)), (11L, jitter(0.02)), (12L, jitter(0.05)),
      (13L, base.map(-_).map(_.toFloat))
    ).toDF("corpus_id", "embedding")
    val queries = Seq((1L, base.map(_.toFloat))).toDF("query_id", "embedding")
    val out = Similarity.topKJoin(queries, corpus, "query_id", "corpus_id",
      "embedding", k = 2).rows
    assert(out.size == 2)
    assert(out.map(_.getLong(1)).toSet == Set(10L, 11L)) // two closest
    assert(out.forall(_.getDouble(2) > 0.99))
  }

  test("cosineNearDupPairs finds high-cosine pairs within buckets") {
    val a = Seq.fill(16)(1.0f)
    val b = a.updated(3, 1.05f)
    val c = (1 to 16).map(i => (if (i % 2 == 0) -1.0f else 1.0f))
    val vecs = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, bands = 4, planesPerBand = 4, dim = 16).rows
    assert(out.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
  }

  test("banded near-dup recall vs brute-force ground truth >= 0.9") {
    // 12 planted clusters of 3 near-identical vectors + 24 decoys; ground
    // truth = every pair with exact cosine >= threshold. Deterministic:
    // fixed RNG seed and fixed hyperplane seed.
    val rnd = new scala.util.Random(7)
    def unit() = IndexedSeq.fill(16)(rnd.nextGaussian())
    val rows = (0 until 12).flatMap { c =>
      val base = unit()
      (0 until 3).map { j =>
        val v = base.map(x => (x + 0.02 * rnd.nextGaussian()).toFloat)
        ((c * 3 + j).toLong, v.toSeq)
      }
    } ++ (0 until 24).map(i => ((100 + i).toLong, unit().map(_.toFloat).toSeq))
    val vecs = rows.toDF("vec_id", "embedding")
    val thr = 0.9
    val truth = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= thr)
      .rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = thr, bands = 8, planesPerBand = 8, dim = 16)
      .rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(found.subsetOf(truth)) // exact verify: no false positives
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (${found.size}/${truth.size})")
  }
}
