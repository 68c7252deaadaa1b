package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.operators.Similarity

/** Pins the documented recall formula of the banded sign-LSH near-dup
  * operator (Similarity.cosineNearDupPairs): for cosine s the collision
  * probability per plane is p = 1 − arccos(s)/π, so a pair survives with
  * probability 1 − (1 − p^P)^B. Sweeping (bands, planesPerBand) across
  * the parameter grid asserts, per deterministic planted dataset:
  *  - exactness: every reported pair is a true >=threshold pair (the
  *    exact-cosine verify admits no false positives), and
  *  - recall: measured recall is within slack of the formula's
  *    expectation (slack = 0.25 ≈ 3σ for ~25 planted pairs).
  * Datasets are seeded per combo, so failures reproduce exactly; results
  * are memoized per combo so ScalaCheck's 100 trials cost 20 Spark jobs.
  */
object LshRecallProps extends Properties("graft.lsh") {
  private lazy val spark = TestSpark.spark

  private val dim = 16
  private val thr = 0.9

  /** 10 planted clusters of 3 near-identical vectors + 20 decoys. */
  private def dataset(seed: Long): IndexedSeq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    def unit() = IndexedSeq.fill(dim)(rnd.nextGaussian())
    (0 until 10).flatMap { c =>
      val base = unit()
      (0 until 3).map { j =>
        ((c * 3 + j).toLong,
          base.map(x => (x + 0.02 * rnd.nextGaussian()).toFloat): Seq[Float])
      }
    }.toIndexedSeq ++
      (0 until 20).map(i => ((100 + i).toLong, unit().map(_.toFloat): Seq[Float]))
  }

  /** Same float→double fold as the codegen'd CosineSimilarity. */
  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Prop]

  private def check(bands: Int, planes: Int): Prop =
    cache.getOrElseUpdate((bands, planes), {
      import spark.implicits._
      val rows = dataset(seed = bands * 31L + planes)
      val truth = (for {
        i <- rows.indices
        j <- (i + 1) until rows.size
        c = cosine(rows(i)._2, rows(j)._2) if c >= thr
      } yield (rows(i)._1, rows(j)._1) -> c).toMap
      val found = Similarity
        .cosineNearDupPairs(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", threshold = thr, bands = bands,
          planesPerBand = planes, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expectedRecall = truth.values.map { c =>
        val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, c))) / math.Pi
        1.0 - math.pow(1.0 - math.pow(p, planes), bands)
      }.sum / truth.size
      val recall = found.size.toDouble / truth.size
      (Prop(truth.nonEmpty) :| "planted pairs exist") &&
        (Prop(found.subsetOf(truth.keySet)) :| "no false positives") &&
        (Prop(recall >= expectedRecall - 0.25) :|
          f"recall $recall%.3f vs formula $expectedRecall%.3f (B=$bands P=$planes)")
    })

  private val paramGen = for {
    bands <- Gen.oneOf(1, 2, 4, 6, 8)
    planes <- Gen.oneOf(2, 4, 6, 8)
  } yield (bands, planes)

  property("banded recall matches the documented formula; verify is exact") =
    Prop.forAll(paramGen) { case (b, p) => check(b, p) }
}
