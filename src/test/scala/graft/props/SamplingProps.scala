package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.operators.{Packing, Sampling}

/** Structural laws of the deterministic subsetting operators: sampling
  * must be monotone in the fraction (a bigger budget only ADDS rows —
  * anything else means split assignments reshuffle when a budget
  * changes), splits must partition the input, and packing must respect
  * the bin-start alignment rule exactly. */
object SamplingProps extends Properties("graft.sampling") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val idsGen: Gen[List[Long]] = for {
    n <- Gen.choose(1, 300)
    ids <- Gen.listOfN(n, Gen.choose(0L, 100000L))
  } yield ids.distinct

  property("sample(f1) is a subset of sample(f2) for f1 <= f2; bounds hold") =
    Prop.forAll(idsGen, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (ids, fa, fb) =>
        import spark.implicits._
        val (f1, f2) = (math.min(fa, fb), math.max(fa, fb))
        val df = ids.toDF("id")
        def sample(f: Double) =
          Sampling.deterministicSample(df, "id", f)
            .collect().map(_.getLong(0)).toSet
        val (s1, s2) = (sample(f1), sample(f2))
        Prop(s1.subsetOf(s2)) :| s"monotonicity: $s1 not in $s2" &&
          Prop(sample(1.0).size == ids.size) :| "fraction 1 keeps all" &&
          Prop(sample(0.0).isEmpty) :| "fraction 0 keeps none"
    }

  property("splits partition the input and agree with the sample threshold") =
    Prop.forAll(idsGen, Gen.choose(0.05, 0.95)) { (ids, w) =>
      import spark.implicits._
      val df = ids.toDF("id")
      val splits = Seq("a" -> w, "b" -> (1.0 - w))
      val out = Sampling.assignSplits(df, "id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val aSet = out.filter(_._2 == "a").map(_._1).toSet
      // split "a" is EXACTLY the deterministic sample at weight w — the
      // two primitives share one bucket function, so budgets compose
      val sampled = Sampling.deterministicSample(df, "id", w)
        .collect().map(_.getLong(0)).toSet
      Prop(out.length == ids.size) :| "exhaustive" &&
        Prop(aSet == sampled) :| s"split-a $aSet != sample $sampled"
    }

  property("weightedSample: monotone in weight, saturates at unitWeight") =
    Prop.forAll(idsGen, Gen.choose(1L, 200L), Gen.choose(1L, 200L),
      Gen.choose(1L, 200L)) { (ids, wa, wb, unit) =>
      import spark.implicits._
      val (w1, w2) = (math.min(wa, wb), math.max(wa, wb))
      def keep(w: Long) = Sampling.weightedSample(
          ids.map(i => (i, w)).toDF("id", "w"), "id", "w", unit)
        .collect().map(_.getLong(0)).toSet
      val (k1, k2) = (keep(w1), keep(w2))
      Prop(k1.subsetOf(k2)) :| s"monotone: $k1 not in $k2" &&
        Prop(keep(unit).size == ids.size) :| "weight == unit keeps all"
    }

  property("temperatureSample: monotone in alpha; alpha=1 keeps all") =
    Prop.forAll(Gen.listOfN(3, Gen.choose(1, 120)), Gen.choose(0.0, 1.0),
      Gen.choose(0.0, 1.0)) { (sizes, aa, ab) =>
      import spark.implicits._
      val (a1, a2) = (math.min(aa, ab), math.max(aa, ab))
      val rows = sizes.zipWithIndex.flatMap { case (n, gi) =>
        (1 to n).map(j => ((gi * 1000 + j).toLong, s"g$gi"))
      }
      val df = rows.toDF("id", "lang")
      def keep(a: Double) = Sampling.temperatureSample(df, "lang", "id", a)
        .collect().map(_.getLong(0)).toSet
      val (k1, k2) = (keep(a1), keep(a2))
      Prop(k1.subsetOf(k2)) :| s"monotone in alpha ($a1 vs $a2)" &&
        Prop(keep(1.0).size == rows.size) :| "alpha=1 keeps all"
    }

  property("upsample: per-key copies = floor(f) or floor(f)+1; multiplier bounded") =
    Prop.forAll(idsGen, Gen.choose(0.1, 4.0)) { (ids, f) =>
      import spark.implicits._
      val base = math.floor(f).toLong
      val out = Sampling.upsample(ids.toDF("id"), "id", f)
        .groupBy("id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val inRange = out.values.forall(c => c == base || c == base + 1)
      val copiesDense = out.keySet.subsetOf(ids.toSet)
      Prop(inRange) :| s"copy counts outside {floor, floor+1}: $out" &&
        Prop(copiesDense) :| "emitted unknown keys" &&
        Prop(base == 0 || out.keySet == ids.toSet) :|
          "factor >= 1 must keep every key"
    }

  private val packGen = for {
    n <- Gen.choose(1, 60)
    counts <- Gen.listOfN(n, Gen.choose(1, 400))
    target <- Gen.choose(50, 500)
  } yield (counts, target)

  property("packBins: bin == floor(running offset / target), per shard") =
    Prop.forAll(packGen) { case (counts, target) =>
      import spark.implicits._
      val rows = counts.zipWithIndex.map { case (c, i) =>
        (i.toLong, if (i % 2 == 0) "x" else "y", c)
      }
      val out = Packing.packBins(rows.toDF("id", "shard", "n"),
          "id", "n", Seq("shard"), target)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getLong(3)))
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy(_._1).scanLeft((0L, 0L, "", 0)) {
          case ((cum, _, _, _), (id, sh, n)) => (cum + n, id, sh, n)
        }.tail.map { case (cum, id, sh, n) => id -> ((cum - n) / target) }
      }
      Prop(out.forall { case (id, _, _, bin) => want(id) == bin }) :|
        s"got ${out.toSeq.sortBy(_._1)} want ${want.toSeq.sortBy(_._1)}"
    }
}
