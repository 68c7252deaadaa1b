package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ArrayFunctions, SortedLongIntersect}

import graft.SparkSpec

/** SortedLongIntersect (r17): the codegen'd two-pointer merge behind the
  * triangle edge-iterator path. Contract: sorted, distinct, null-free
  * long arrays in; their set intersection (sorted) out. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def viaCodegen(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    Seq((a, b)).toDF("a", "b")
      .select(ArrayFunctions.sortedIntersect(col("a"), col("b")))
      .rows.head.getSeq[Long](0)

  private def viaInterpreted(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Long]) = Literal.create(xs, ArrayType(LongType))
    SortedLongIntersect(lit(a), lit(b)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  test("matches the set intersection on random sorted distinct arrays, " +
      "codegen and interpreted paths agree") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val want = a.toSet.intersect(b.toSet).toSeq.sorted
      assert(viaCodegen(a, b) == want)
      assert(viaInterpreted(a, b) == want)
    }
  }

  test("empty and disjoint inputs yield empty; null propagates null") {
    assert(viaCodegen(Seq.empty, Seq(1L, 2L)) == Seq.empty)
    assert(viaCodegen(Seq(1L, 2L), Seq.empty) == Seq.empty)
    assert(viaCodegen(Seq(1L, 3L), Seq(2L, 4L)) == Seq.empty)
    val r = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(ArrayFunctions.sortedIntersect(col("a"), col("b"))).rows.head
    assert(r.isNullAt(0))
  }
}
