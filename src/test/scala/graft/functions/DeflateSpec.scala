package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compression-ratio signal is spec-gated (not DuckDB-oracled):
  * deflate output is deterministic per JVM zlib build but not
  * engine-portable, so correctness is pinned here — an independent
  * single-shot Deflater replay, ratio invariants on planted text
  * classes, and interpreted-vs-codegen agreement. */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  // independent replay: a FRESH one-shot Deflater per call (no reset,
  // no thread-local) — cross-checks graft.util.Deflate's reuse plumbing
  private def oneShot(s: String): Long = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  private def sparkLen(texts: Seq[String]): Seq[Long] =
    texts.toDF("t").select(TextFunctions.deflateLength(col("t")).as("n"))
      .rows.map(_.getLong(0))

  test("deflateLength matches an independent one-shot Deflater") {
    val texts = Seq("", "a", "hello world", "aaaaaaaaaaaaaaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog " * 20,
      "héllo wörld — ünïcode ☃ text", (0 until 500).map(_.toString).mkString(","))
    assert(sparkLen(texts) == texts.map(oneShot))
  }

  test("thread-local reuse is stable: same input, same length, many rows") {
    // 2000 rows across partitions exercise reset-per-row on shared workers
    val df = (0 until 2000).map(i => s"document body ${i % 7}").toDF("t")
      .repartition(8)
    val got = df.select(TextFunctions.deflateLength(col("t")).as("n"),
        col("t")).groupBy("t").agg(countDistinct(col("n")).as("d"))
      .rows.map(_.getLong(1))
    assert(got.forall(_ == 1L))
  }

  test("compressionRatio orders text classes: repetition < natural < noise") {
    val rep = "spam spam spam spam " * 100
    val nat = "The histogram reader takes the upper edge of the first " +
      "bin whose cumulative count reaches the requested rank, which " +
      "bounds the error by one bin width at any scale. " * 5
    val rnd = new scala.util.Random(42)
    val noise = Seq.fill(2000)(rnd.nextPrintableChar()).mkString
    val Seq(r1, r2, r3) =
      Seq(rep, nat, noise).toDF("t")
        .select(TextFunctions.compressionRatio(col("t")).as("r"))
        .rows.map(_.getLong(0))
    assert(r1 < r2 && r2 < r3, s"expected $r1 < $r2 < $r3")
    assert(r1 < 100000L)  // degenerate repetition: < 0.1 ratio
    assert(r3 > 300000L)  // high-entropy noise compresses poorly
  }

  test("compressionRatio is exact integer ppm and NULL on empty text") {
    val rows = Seq("abcabcabc", "").toDF("t")
      .select(col("t"), TextFunctions.compressionRatio(col("t")).as("r"))
      .rows
    val expected = oneShot("abcabcabc") * 1000000L / 9L
    assert(rows.find(_.getString(0) == "abcabcabc").get.getLong(1) == expected)
    assert(rows.find(_.getString(0) == "").get.isNullAt(1))
  }

  test("interpreted path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.{CompressionRatioPpm, DeflateLength}
    val s = "interpreted-path check " * 8
    assert(DeflateLength(Literal(s)).eval(null) == oneShot(s))
    assert(CompressionRatioPpm(Literal(s)).eval(null) ==
      oneShot(s) * 1000000L / s.getBytes("UTF-8").length)
    assert(CompressionRatioPpm(Literal("")).eval(null) == null)
  }
}
