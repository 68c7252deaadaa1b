package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 5000L).map(i => (i, s"d$i")).toDF("id", "v")

  test("deterministicSample: stable, near-rate, and boundary fractions") {
    val s1 = Sampling.deterministicSample(ids, "id", 0.25)
    val n = s1.count()
    assert(n > 5000 * 0.22 && n < 5000 * 0.28, s"rate off: $n/5000")
    // same rows every run — no RNG state anywhere
    assert(s1.collect().map(_.getLong(0)).toSet ==
      Sampling.deterministicSample(ids, "id", 0.25)
        .collect().map(_.getLong(0)).toSet)
    assert(Sampling.deterministicSample(ids, "id", 1.0).count() == 5000)
    assert(Sampling.deterministicSample(ids, "id", 0.0).count() == 0)
  }

  test("sampling at a smaller fraction is a subset of a larger one") {
    val small = Sampling.deterministicSample(ids, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.deterministicSample(ids, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("assignSplits: disjoint, exhaustive, near the weights, scan-side") {
    val df = Sampling.assignSplits(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = df.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(counts("train") > 5000 * 0.76 && counts("train") < 5000 * 0.84)
    assert(counts("val") > 5000 * 0.07 && counts("val") < 5000 * 0.13)
    // pure projection: no exchange in the split assignment itself
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment shuffled:\n$plan")
  }

  test("stratifiedSample: per-group rates, default drop, scan-side") {
    val docs = (1L to 3000L).map(i => (i, s"lang${i % 3}"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("lang0" -> 1.0, "lang1" -> 0.25))
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("lang0") == 1000) // fraction 1.0 keeps the stratum whole
    assert(counts("lang1") > 1000 * 0.20 && counts("lang1") < 1000 * 0.30)
    assert(!counts.contains("lang2")) // unlisted stratum drops by default
    // a stratum's sample == the plain sample of that stratum at its rate
    // (the per-group threshold changes nothing about WHICH hashes pass)
    assert(out.filter($"lang" === "lang1").collect().map(_.getLong(0)).toSet ==
      Sampling.deterministicSample(docs.filter($"lang" === "lang1"), "id", 0.25)
        .collect().map(_.getLong(0)).toSet)
    // still a pure pushed filter — no exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample shuffled:\n$plan")
  }

  test("weightedSample: proportional keep-rate, saturation, null/zero drop") {
    val weighted = (1L to 8000L).map { i =>
      (i, if (i <= 4000) 25L else 100L) // half-weight vs saturated rows
    }.toDF("id", "w")
    val kept = Sampling.weightedSample(weighted, "id", "w", unitWeight = 100L)
    val byW = kept.groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weight >= unitWeight: always kept
    assert(byW(100L) == 4000L, s"saturated rows dropped: $byW")
    // weight 25/100: ~25% kept
    assert(byW(25L) > 4000 * 0.21 && byW(25L) < 4000 * 0.29,
      s"proportional rate off: ${byW(25L)}/4000")
    // weight 0 / NULL: dropped
    val degenerate = Seq((1L, Some(0L)), (2L, None), (3L, Some(-5L)))
      .toDF("id", "w")
    assert(Sampling.weightedSample(degenerate, "id", "w", 10L).count() == 0)
    // scan-side: a pure filter, no exchange
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weighted sample shuffled:\n$plan")
  }

  test("weightedSample agrees with deterministicSample at a uniform weight") {
    // constant weight w with unit U must equal the plain sample at
    // fraction ceil-of(w/U) granularity — both share one bucket function;
    // at w*65536/U integral the two thresholds are literally the same
    val constW = ids.withColumn("w", lit(25L))
    val viaWeight = Sampling.weightedSample(constW, "id", "w", 100L)
      .collect().map(_.getLong(0)).toSet
    val viaFraction = Sampling.deterministicSample(ids, "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(viaWeight == viaFraction)
  }

  test("temperatureSample: smallest group kept whole, shares flatten by sqrt") {
    // group sizes 1600/400/100 → at α=0.5 the fractions are exactly
    // sqrt(100/1600)=0.25, sqrt(100/400)=0.5, 1.0 (totals cancel)
    val docs = ((1L to 1600L).map(i => (i, "en")) ++
      (1601L to 2000L).map(i => (i, "de")) ++
      (2001L to 2100L).map(i => (i, "rare"))).toDF("id", "lang")
    val f = Sampling.temperatureFractions(docs, "lang", 0.5)
    assert(f("rare") == 1.0)
    assert(math.abs(f("en") - 0.25) < 1e-12, s"f(en)=${f("en")}")
    assert(math.abs(f("de") - 0.5) < 1e-12, s"f(de)=${f("de")}")
    val counts = Sampling.temperatureSample(docs, "lang", "id", 0.5)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 100)
    assert(counts("en") > 1600 * 0.21 && counts("en") < 1600 * 0.29,
      s"en rate off: ${counts("en")}")
    // α=1 is the identity schedule
    assert(Sampling.temperatureSample(docs, "lang", "id", 1.0).count() == 2100)
    // α=0 equalizes expected counts at the smallest group's size
    val eq = Sampling.temperatureSample(docs, "lang", "id", 0.0)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq("rare") == 100)
    assert(eq("en") > 70 && eq("en") < 130, s"equalized en off: ${eq("en")}")
  }

  test("upsample: exact floor copies + hash-chosen fraction, indexed copies") {
    val df = (1L to 4000L).toDF("id")
    val out = Sampling.upsample(df, "id", 2.25)
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (1L to 4000L).toSet) // every row survives
    assert(out.values.forall(c => c == 2L || c == 3L))
    val triples = out.values.count(_ == 3L)
    assert(triples > 4000 * 0.21 && triples < 4000 * 0.29,
      s"fraction off: $triples/4000")
    // deterministic: same triples every run
    assert(Sampling.upsample(df, "id", 2.25).groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == out)
    // copy indices are dense 0..n-1 per id
    val copies = Sampling.upsample(df.limit(50), "id", 2.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
    assert(copies.forall(c => c.map(_._2).sorted.toSeq ==
      (0L until c.size).toSeq))
    // factor < 1 degrades to sampling with copy=0
    val sub = Sampling.upsample(df, "id", 0.5)
    assert(sub.count() > 4000 * 0.45 && sub.count() < 4000 * 0.55)
  }

  test("resampleToMixture: hits target proportions, thins and repeats at once") {
    // observed 3000/600/150; targets 50/25/25 at budget 1200 ->
    // factors en=0.2 (thin), de=0.5 (thin), rare=2.0 (repeat)
    val docs = ((1L to 3000L).map(i => (i, "en")) ++
      (3001L to 3600L).map(i => (i, "de")) ++
      (3601L to 3750L).map(i => (i, "rare"))).toDF("id", "lang")
    val targets = Map("en" -> 0.5, "de" -> 0.25, "rare" -> 0.25)
    val f = Sampling.mixtureFactors(docs, "lang", targets, 1200L)
    assert(math.abs(f("en") - 0.2) < 1e-12 &&
      math.abs(f("de") - 0.5) < 1e-12 && math.abs(f("rare") - 2.0) < 1e-12, f)
    val out = Sampling.resampleToMixture(docs, "lang", "id", targets, 1200L)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 300L) // integral factor 2: exact
    assert(counts("en") > 600 * 0.85 && counts("en") < 600 * 1.15,
      s"en off: ${counts("en")}")
    assert(counts("de") > 300 * 0.85 && counts("de") < 300 * 1.15,
      s"de off: ${counts("de")}")
    // a group missing from targets is dropped; unknown target errors
    val noTarget = Sampling.resampleToMixture(docs, "lang", "id",
      targets - "de", 1200L)
    assert(noTarget.filter($"lang" === "de").count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.mixtureFactors(docs, "lang", targets + ("xx" -> 0.1), 100L)
    }
  }

  test("writeEpochShuffled: files form one global order; epochs differ") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_epoch_").toString
    val docs = (1L to 2000L).toDF("id")
    Sampling.writeEpochShuffled(docs, "id", epoch = 1, s"$root/e1", 4)
    val parts = new java.io.File(s"$root/e1").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 4)
    // reading part files in name order must yield the exact global
    // order of the epoch key (range partitioning => file i < file i+1)
    val seen = parts.flatMap { f =>
      spark.read.parquet(f.toString)
        .select(col("id"),
          Sampling.epochOrderKey(col("id"), 1).as("ok"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }
    assert(seen.map(_._2).toSeq == seen.map(_._2).sorted.toSeq,
      "files do not concatenate into the global epoch order")
    assert(seen.map(_._1).toSet == (1L to 2000L).toSet)
    // a different epoch produces a different (but equally total) order
    Sampling.writeEpochShuffled(docs, "id", epoch = 2, s"$root/e2", 4)
    val firstE2 = spark.read.parquet(s"$root/e2/" +
      new java.io.File(s"$root/e2").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).min)
      .select("id").rows.map(_.getLong(0))
    val firstE1 = spark.read.parquet(parts.head.toString)
      .select("id").rows.map(_.getLong(0))
    assert(firstE1.toSet != firstE2.toSet, "epoch orders identical")
  }

  test("per-group operators fail fast on high-cardinality group columns") {
    // an id-like group column (one value per row, > MaxGroups distinct)
    // must error immediately instead of collecting the corpus's key
    // space to the driver
    val idLike = (1L to (Sampling.MaxGroups + 10L))
      .map(i => (i, s"doc_$i")).toDF("id", "doc_id")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.temperatureFractions(idLike, "doc_id", 0.5)
    }
    assert(e1.getMessage.contains("distinct values"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureFactors(idLike, "doc_id",
        Map("doc_1" -> 1.0), 100L)
    }
    // oversized literal fractions map: when-chain size cap
    val bigMap = (1 to Sampling.MaxGroups + 1)
      .map(i => s"g$i" -> 0.5).toMap
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(idLike, "doc_id", "id", bigMap)
    }
    // unitWeight beyond 2^47 would overflow bucket*unitWeight
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(idLike.withColumn("w", lit(1L)),
        "id", "w", (1L << 47) + 1)
    }
  }

  test("capPerGroup: bounded, deterministic, keeps small groups whole") {
    val docs = (1L to 900L).map(i => (i, s"lang${i % 3}"))
      .toDF("id", "lang")
      .unionAll(Seq((1000L, "rare")).toDF("id", "lang"))
    val capped = Sampling.capPerGroup(docs, Seq("lang"), "id", 50)
    val counts = capped.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("lang0") == 50 && counts("lang1") == 50 && counts("lang2") == 50)
    assert(counts("rare") == 1)
    assert(capped.collect().map(_.getLong(0)).toSet ==
      Sampling.capPerGroup(docs, Seq("lang"), "id", 50)
        .collect().map(_.getLong(0)).toSet)
  }
}
