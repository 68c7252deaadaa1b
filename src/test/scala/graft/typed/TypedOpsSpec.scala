package graft.typed

import graft.SparkSpec

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("spendByCustomer: exact BigDecimal aggregation") {
    val ds = Seq(
      TypedOps.Order(1, 100, "F", 10.10),
      TypedOps.Order(2, 100, "O", 20.25),
      TypedOps.Order(3, 200, "F", 5.05)
    ).toDS()
    val out = TypedOps.spendByCustomer(ds).orderBy("o_custkey").rows
    assert(out.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((100L, 30.35), (200L, 5.05)))
  }

  test("typed load gives compile-checked fields") {
    val ds = TypedOps.orders(spark, "/root/testdata/sf0.001")
    val top = ds.filter(_.o_orderstatus == "F").map(_.o_totalprice).collect()
    assert(top.nonEmpty && top.forall(_ > 0))
  }
}
