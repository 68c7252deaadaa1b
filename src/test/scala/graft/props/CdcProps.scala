package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.pipeline.Cdc

/** Structural laws of the CDC operators on random inputs:
  *
  *  - SCD2 intervals must tile each key's timeline exactly — start at the
  *    key's first event, chain valid_to → next valid_from with no gap or
  *    overlap, end open — and collapsing is idempotent (running scd2 on
  *    its own surviving rows changes nothing).
  *  - snapshotDiff must be consistent with applying the diff: old minus
  *    deletes/updates plus inserts/updates-from-new equals new, and
  *    diffing a snapshot against itself is empty.
  *  - merge must be idempotent for delete-free change sets (merging the
  *    same changes twice equals merging once).
  */
object CdcProps extends Properties("graft.cdc") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  /** Random change log: (key, seq, state) with unique (key, seq). */
  private val logGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 8L)
      s <- Gen.choose(0L, 40L)
      v <- Gen.oneOf("A", "B", "C")
    } yield (k, s, v))
  } yield rows.map { case (k, s, v) => ((k, s), v) }.toMap.toList
    .map { case ((k, s), v) => (k, s, v) }

  property("scd2 intervals tile the timeline; collapse is idempotent") =
    Prop.forAll(logGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "seq", "state")
      val out = Cdc.scd2(df, Seq("k"), "seq", "seq", Seq("state"))
        .select("k", "state", "valid_from", "valid_to")
        .as[(Long, String, Long, Option[Long])].collect().toSeq
      val byKey = out.groupBy(_._1)
      val tiles = byKey.forall { case (k, ivs) =>
        val sorted = ivs.sortBy(_._3)
        val firstSeq = rows.filter(_._1 == k).map(_._2).min
        sorted.head._3 == firstSeq &&
          sorted.last._4.isEmpty &&
          sorted.sliding(2).forall {
            case Seq(a, b) => a._4.contains(b._3) && a._2 != b._2
            case _ => true
          }
      }
      // idempotence: the surviving rows, re-collapsed, are unchanged
      val again = Cdc.scd2(
          out.map(t => (t._1, t._3, t._2)).toDF("k", "seq", "state"),
          Seq("k"), "seq", "seq", Seq("state"))
        .select("k", "state", "valid_from", "valid_to")
        .as[(Long, String, Long, Option[Long])].collect().toSeq
      Prop(tiles) :| s"intervals do not tile: $out" &&
        Prop(again.sorted.sameElements(out.sorted)) :| "collapse not idempotent"
    }

  /** Random keyed snapshot: unique keys, small attr domain so updates,
    * deletes, inserts, and no-ops all occur. */
  private val snapGen: Gen[Map[Long, (String, Long)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 80L)
      a <- Gen.oneOf("x", "y")
      b <- Gen.choose(0L, 3L)
    } yield k -> ((a, b)))
  } yield rows.toMap

  property("snapshotDiff classifies exactly the changed keys; self-diff empty") =
    Prop.forAll(snapGen, snapGen) { (oldM, newM) =>
      import spark.implicits._
      def toDf(m: Map[Long, (String, Long)]) =
        m.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "a", "b")
      val diff = Cdc.snapshotDiff(toDf(oldM), toDf(newM), Seq("k"))
        .as[(Long, String)].collect().toMap
      val expected =
        (newM.keySet -- oldM.keySet).map(_ -> "insert").toMap ++
          (oldM.keySet -- newM.keySet).map(_ -> "delete").toMap ++
          (oldM.keySet & newM.keySet).collect {
            case k if oldM(k) != newM(k) => k -> "update"
          }.toMap
      val self = Cdc.snapshotDiff(toDf(oldM), toDf(oldM), Seq("k")).count()
      Prop(diff == expected) :| s"diff=$diff expected=$expected" &&
        Prop(self == 0L) :| "self-diff not empty"
    }

  property("merge of a delete-free change set is idempotent") =
    Prop.forAll(snapGen, snapGen) { (baseM, chgM) =>
      import spark.implicits._
      def toDf(m: Map[Long, (String, Long)]) =
        m.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "a", "b")
      val once = Cdc.merge(toDf(baseM), toDf(chgM), Seq("k"))
        .as[(Long, String, Long)].collect().toSet
      val twice = Cdc.merge(
          Cdc.merge(toDf(baseM), toDf(chgM), Seq("k")), toDf(chgM), Seq("k"))
        .as[(Long, String, Long)].collect().toSet
      Prop(once == twice) :| s"once=$once twice=$twice" &&
        Prop(once == (baseM ++ chgM).toSet.map(
          (t: (Long, (String, Long))) => (t._1, t._2._1, t._2._2)))
          .:|("merge != map-union semantics")
    }
}
