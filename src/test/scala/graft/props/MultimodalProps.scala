package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.multimodal.Audio
import graft.operators.NearDup

/** Randomized cross-checks for the round-5 multimodal primitives. */
object MultimodalProps extends Properties("graft.multimodal") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def toBytes(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    out
  }

  property("pcm16 round-trips any 16-bit sample sequence") =
    Prop.forAll(Gen.listOf(Gen.choose(-32768, 32767))) { s =>
      Audio.pcm16(toBytes(s.toArray)).toSeq == s
    }

  property("envelope hash is stable under gain doubling (within rounding)") =
    Prop.forAll(Gen.listOfN(260, Gen.choose(-12000, 12000))) { s =>
      val a = Audio.envelopeHash64(s.toArray)
      val b = Audio.envelopeHash64(s.map(_ * 2).toArray)
      // integer means under x2 gain differ by at most 1, so only bits
      // whose adjacent windows were within 1 of each other may flip
      val ham = java.lang.Long.bitCount(a ^ b)
      Prop(ham <= 8) :| s"gain doubling flipped $ham bits"
    }

  property("jaccardPairsOverTokens == brute-force set Jaccard") =
    Prop.forAll(
      Gen.choose(2, 8).flatMap(n => Gen.listOfN(n,
        Gen.nonEmptyListOf(Gen.choose(1L, 12L)))),
      Gen.choose(0.2, 0.8)) { (sets, thr) =>
      val rows = sets.zipWithIndex.flatMap { case (ts, i) =>
        ts.distinct.map(t => (i.toLong, t))
      }
      val got = NearDup.jaccardPairsOverTokens(
          rows.toDF("id", "sh"), "id", thr, maxDocFreq = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val distinctSets = sets.map(_.distinct.toSet).zipWithIndex
      val want = (for {
        (sa, ia) <- distinctSets; (sb, ib) <- distinctSets if ia < ib
        j = (sa intersect sb).size.toDouble / (sa union sb).size
        if j >= thr
      } yield (ia.toLong, ib.toLong, j)).toSet
      Prop(got == want) :| s"got $got want $want"
    }
}
