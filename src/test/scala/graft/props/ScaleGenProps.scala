package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.{ScaleGen, TestSpark}
import graft.functions.TextFunctions

/** Property tests pinning the construction invariants SCALING.md's
  * measured-linearity methodology hangs on (the spot-checks in
  * ScaleGenSpec run on the fixed sf0.001 fixture; these run the tagging
  * unit over RANDOM corpora so a future TextFunctions or tagging change
  * that breaks either invariant goes red on inputs nobody hand-picked):
  *
  *  1. copy-k language-id and quality score equal copy-0's for EVERY
  *     doc — per-copy statistics identical is what makes any
  *     superlinear wall-time an operator defect rather than a data
  *     artifact;
  *  2. non-stopword vocabularies are pairwise disjoint across copies —
  *     word shingles then cannot collide cross-copy (a bigram (a,b)
  *     maps bijectively to (a_k,b_k)), which is what keeps LSH bucket
  *     sizes and candidate-pair counts linear in the copy count.
  */
object ScaleGenProps extends Properties("graft.ScaleGen") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stopwords: Seq[String] =
    TextFunctions.langProfiles.flatMap(_._2)

  // token pool: profile stopwords (several languages), contentful
  // words, numerics, punctuation-bearing tokens — everything split on
  // whitespace can hand the tagger
  private val tokenGen: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf(stopwords),
    4 -> Gen.oneOf("alpha", "bravo", "Carbon", "delta9", "emission",
      "flux", "gamma", "HELIX", "ion", "joule"),
    1 -> Gen.choose(0, 9999).map(_.toString),
    1 -> Gen.oneOf("x,y", "a.b.", "q;", "(p)", "r!"))

  // docs join with single spaces (the fixture contract: ScaleGen
  // re-joins tokens with " ", so pathological whitespace is out of
  // scope by construction); stopword-only docs are generated too —
  // they are the documented invariant-text residue
  private val docGen: Gen[String] = Gen.frequency(
    8 -> Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, tokenGen)),
    1 -> Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(stopwords))))
    .map(_.mkString(" "))

  private val corpusGen: Gen[List[String]] =
    Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, docGen))

  private val copies = 3

  /** The N× corpus as the generator builds it, without parquet I/O. */
  private def scaled(texts: List[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val base = texts.length.toLong
    (0 until copies)
      .map(k => ScaleGen.shifted(df, k, Map("doc_id" -> base), Seq("text"))
        .withColumn("copy", lit(k)))
      .reduce(_ unionAll _)
  }

  property("copy-k langid and quality score equal copy-0's for every doc") =
    Prop.forAll(corpusGen) { texts =>
      val base = texts.length.toLong
      val scored = scaled(texts).select(
        col("copy"), (col("doc_id") % base).as("src_id"),
        TextFunctions.languageId(col("text")).as("lang"),
        TextFunctions.qualityScore(col("text"), stopwords).as("q"))
      val byDoc = scored.collect()
        .groupBy(_.getAs[Long]("src_id"))
        .values
      byDoc.forall { rows =>
        rows.map(r => (r.getAs[String]("lang"), r.getAs[Double]("q")))
          .distinct.size == 1
      }
    }

  property("non-stopword vocabularies are pairwise disjoint across copies") =
    Prop.forAll(corpusGen) { texts =>
      val vocabByCopy = scaled(texts)
        .select(col("copy"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .filter(!col("tok").isin(stopwords: _*) && col("tok") =!= "")
        .distinct().collect()
        .groupBy(_.getAs[Int]("copy"))
        .view.mapValues(_.map(_.getAs[String]("tok")).toSet).toMap
      val pairs = for {
        a <- 0 until copies; b <- (a + 1) until copies
      } yield (vocabByCopy.getOrElse(a, Set.empty),
        vocabByCopy.getOrElse(b, Set.empty))
      pairs.forall { case (va, vb) => va.intersect(vb).isEmpty }
    }

  property("copy count and token counts: every copy holds every doc, " +
      "token count per doc unchanged by tagging") =
    Prop.forAll(corpusGen) { texts =>
      val counted = scaled(texts).select(
        col("copy"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n")).collect()
      counted.length == texts.length * copies &&
        counted.groupBy(_.getAs[Long]("doc_id")).forall(_._2.length == 1) &&
        counted.forall { r =>
          val src = (r.getAs[Long]("doc_id") % texts.length).toInt
          r.getAs[Int]("n") == texts(src).split("\\s+").length
        }
    }
}
