package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.operators.NearDupIndex
import org.apache.spark.sql.functions._

/** Randomized gate for the exactly-once streamed crawl dedup: a corpus
  * of identical-text duplicate GROUPS (group membership random, group
  * sizes random), split into two arrivals ordered by id — the regime
  * where the streamed greedy policy and the one-shot min-id-per-group
  * policy provably coincide (the earliest-arriving copy of a group is
  * also its min id, and identical texts make every match exact, so
  * transitive near-dup chains — where greedy and connected-components
  * keepers legitimately diverge — cannot occur). Accepted set must be
  * EXACTLY one min id per text group, for any random grouping and any
  * id-ordered cut point. Trials are few (each runs two streaming
  * drains) but seeded, so failures replay exactly. */
object StreamNearDupProps extends Properties("graft.streamNearDup") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(4)

  private def doc(base: Int): String =
    (0 until 12).map(j => s"t${base}_$j").mkString(" ")

  property("two id-ordered arrivals accept exactly min-id per text group") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val nDocs = 20 + rnd.nextInt(20)
      val nGroups = 3 + rnd.nextInt(6)
      // id -> random text group; ids 0..n-1, cut at a random point
      val groupOf = (0 until nDocs).map(i => i -> rnd.nextInt(nGroups))
      val corpus = groupOf.map { case (i, g) => (i.toLong, doc(g)) }
      val cut = 1 + rnd.nextInt(nDocs - 1)
      val root = java.nio.file.Files
        .createTempDirectory("graft_sndp_").toString
      try {
        corpus.take(cut).toDF("doc_id", "text")
          .write.mode("append").parquet(s"$root/src")
        NearDupIndex.streamIngest(spark, s"$root/src",
          corpus.toDF("doc_id", "text").schema,
          s"$root/index", s"$root/ckpt", "doc_id", "text")
        corpus.drop(cut).toDF("doc_id", "text")
          .write.mode("append").parquet(s"$root/src")
        NearDupIndex.streamIngest(spark, s"$root/src",
          corpus.toDF("doc_id", "text").schema,
          s"$root/index", s"$root/ckpt", "doc_id", "text")
        val got = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
          .collect().map(_.getLong(0)).toSet
        val expected = groupOf.groupBy(_._2)
          .values.map(_.map(_._1).min.toLong).toSet
        val ok = got == expected
        if (!ok) println(s"[sndp] seed=$seed got=$got expected=$expected")
        ok
      } finally graft.util.Fs.deleteRecursively(new java.io.File(root))
    }

  /** Group member m's text: 12 shared group tokens plus ONE unique
    * trailing token — pairwise jaccard ~0.83 within a group (≥ the 0.5
    * threshold) but texts UNEQUAL, so exact dedup never fires and the
    * near-dup machinery (banding + stored-index verify) carries the
    * whole decision; disjoint token universes across groups. */
  private def nearDoc(g: Int, m: Int): String =
    ((0 until 12).map(j => s"g${g}_$j") :+ s"u${g}_$m").mkString(" ")

  property("near-dup twins: streamed accept == one-shot probe composition") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val nDocs = 16 + rnd.nextInt(16)
      val nGroups = 3 + rnd.nextInt(5)
      val corpus = (0 until nDocs).map { i =>
        (i.toLong, nearDoc(rnd.nextInt(nGroups), i))
      }
      val cut = 1 + rnd.nextInt(nDocs - 1)
      val b1 = corpus.take(cut).toDF("doc_id", "text")
      val b2 = corpus.drop(cut).toDF("doc_id", "text")
      val root = java.nio.file.Files
        .createTempDirectory("graft_sndp_near_").toString
      try {
        b1.write.mode("append").parquet(s"$root/src")
        NearDupIndex.streamIngest(spark, s"$root/src", b1.schema,
          s"$root/index", s"$root/ckpt", "doc_id", "text")
        b2.write.mode("append").parquet(s"$root/src")
        NearDupIndex.streamIngest(spark, s"$root/src", b2.schema,
          s"$root/index", s"$root/ckpt", "doc_id", "text")
        val got = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
          .collect().map(_.getLong(0)).toSet
        // the one-shot composition of the SAME primitives (identical
        // minhash parameters, so any banding miss affects both paths
        // identically): clean each batch within itself, index batch 1,
        // probe batch 2's survivors against it, accept the non-hits
        def cleanWithin(df: org.apache.spark.sql.DataFrame) = {
          val exact = graft.operators.Dedup
            .exactKeepFirst(df, "text", "doc_id")
          graft.operators.Components.keepClusterRepresentatives(
            exact, "doc_id",
            graft.operators.NearDup.minhashPairs(
              exact, "doc_id", "text", 3, 8, 2, 0.5, 1000))
        }
        val b1clean = cleanWithin(b1).localCheckpoint()
        NearDupIndex.write(b1clean, "doc_id", "text", s"$root/oneshot")
        val b2within = cleanWithin(b2).localCheckpoint()
        val hits = NearDupIndex.probe(spark, s"$root/oneshot", b2within,
            "doc_id", "text")
          .select(col("new_id")).distinct()
          .collect().map(_.getLong(0)).toSet
        val expected =
          b1clean.select(col("doc_id")).collect().map(_.getLong(0)).toSet ++
            (b2within.select(col("doc_id")).collect().map(_.getLong(0))
              .toSet -- hits)
        val ok = got == expected
        if (!ok) println(
          s"[sndp-near] seed=$seed cut=$cut got=$got expected=$expected")
        ok
      } finally graft.util.Fs.deleteRecursively(new java.io.File(root))
    }
}
