package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Empirical recall gates for the materialized ANN serving paths
  * (q68/q71/q92/q98/q125): measured recall@10 vs bruteForceTopK ground
  * truth over 20 spread queries on the sf0.01 embeddings. LshRecallProps
  * pins the collision FORMULA; this pins what the shipped index params
  * actually achieve on data — a params change that silently tanks real
  * recall fails here, not in production. Measured values (logged in
  * SCALING.md): single 8-plane LSH 0.11, multi-table 4×4 LSH 0.945, IVF
  * nProbe=2 0.44, nProbe=8 0.87. Floors sit under the measurement by a
  * margin that absorbs fixture regeneration, not regressions. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val k = 10
  private lazy val emb = graft.Tables.load(spark, dir, "embeddings").cache()
  private lazy val queryIds = (0L until 500L by 25L).toSeq
  private lazy val truths: Map[Long, Set[Long]] = queryIds.map(q => q ->
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)
      .collect().map(_.getLong(0)).toSet).toMap
  private lazy val qvecs: Map[Long, Seq[Double]] = emb
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  private def meanRecall(got: Long => DataFrame): Double = {
    val rs = queryIds.map { q =>
      val ids = got(q).collect().map(_.getLong(0)).toSet
      (truths(q) intersect ids).size.toDouble / k
    }
    rs.sum / rs.size
  }

  private def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook(
      graft.util.Fs.deleteRecursively(new java.io.File(p)))
    p
  }

  test("multi-table LSH (4x4, default) recall >= 0.85; single table >= 0.05") {
    val single = tempDir("ann-lsh-")
    Similarity.writeLshIndex(emb, "embedding", single, numPlanes = 8, dim = 64)
    val planes = Similarity.hyperplanes(8, 64)
    val singleRecall = meanRecall { q =>
      Similarity.lshTopKIndexed(spark, single, "vec_id", "embedding",
        qvecs(q), Similarity.bucketOf(qvecs(q), planes), q, k)
    }
    val multi = tempDir("ann-mlsh-")
    Similarity.writeMultiLshIndex(emb, "embedding", multi,
      tables = 4, numPlanes = 4, dim = 64)
    val multiRecall = meanRecall { q =>
      Similarity.multiLshTopKIndexed(spark, multi, "vec_id", "embedding",
        qvecs(q), q, k, tables = 4, numPlanes = 4, dim = 64)
    }
    info(f"lsh single(8 planes)=$singleRecall%.3f multi(4x4)=$multiRecall%.3f")
    assert(singleRecall >= 0.05, f"single-table LSH recall $singleRecall%.3f")
    assert(multiRecall >= 0.85, f"multi-table LSH recall $multiRecall%.3f")
    assert(multiRecall > singleRecall + 0.3,
      "multi-table must dominate the single table on diffuse neighborhoods")
  }

  test("IVF recall: >= 0.35 at nProbe=2, >= 0.75 at nProbe=8, monotone") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val path = tempDir("ann-ivf-")
    Ivf.writeIndex(emb, "embedding", model, path)
    def recallAt(np: Int): Double = meanRecall { q =>
      Ivf.topKIndexed(spark, path, "vec_id", "embedding",
        qvecs(q).toIndexedSeq, model, q, k, nProbe = np)
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    info(f"ivf nProbe=2 recall=$r2%.3f nProbe=8 recall=$r8%.3f")
    assert(r2 >= 0.35, f"IVF nProbe=2 recall $r2%.3f")
    assert(r8 >= 0.75, f"IVF nProbe=8 recall $r8%.3f")
    assert(r8 > r2, "recall must be monotone in nProbe")
  }

  test("quantization costs (almost) no recall on either family") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val fpath = tempDir("ann-ivf-f-")
    val qpath = tempDir("ann-ivf-q-")
    Ivf.writeIndex(emb, "embedding", model, fpath)
    Ivf.writeQuantizedIndex(emb, "vec_id", "embedding", model, qpath)
    def floatR(np: Int) = meanRecall { q =>
      Ivf.topKIndexed(spark, fpath, "vec_id", "embedding",
        qvecs(q).toIndexedSeq, model, q, k, nProbe = np)
    }
    def quantR(np: Int) = meanRecall { q =>
      Ivf.quantizedTopKIndexed(spark, qpath, "vec_id",
        qvecs(q).toIndexedSeq, model, q, k, nProbe = np)
    }
    val (f2, q2) = (floatR(2), quantR(2))
    info(f"ivf nProbe=2 float=$f2%.3f int8=$q2%.3f")
    assert(math.abs(f2 - q2) <= 0.05,
      f"int8 recall $q2%.3f drifted from float $f2%.3f")
  }
}
