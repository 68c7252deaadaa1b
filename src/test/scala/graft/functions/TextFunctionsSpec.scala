package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c.as("v")).rows.head

  test("token counts and distinct counts") {
    assert(one(TextFunctions.tokenCount(lit("a b  c\td"))).getInt(0) == 4)
    assert(one(TextFunctions.distinctTokenCount(lit("a b a b c"))).getInt(0) == 3)
  }

  test("stopwordRatio and punctRatio") {
    assert(one(TextFunctions.stopwordRatio(lit("the cat and the dog"),
      Seq("the", "and"))).getDouble(0) == 3.0 / 5.0)
    assert(one(TextFunctions.punctRatio(lit("ab.,"))).getDouble(0) == 0.5)
  }

  test("qualityScore is in [0,1] and rewards diversity") {
    val rich = one(TextFunctions.qualityScore(
      lit(((1 to 100).map(i => s"w$i")).mkString(" ")), Seq("the"))).getDouble(0)
    val poor = one(TextFunctions.qualityScore(
      lit(Seq.fill(100)("the").mkString(" ")), Seq("the"))).getDouble(0)
    assert(rich > 0.9 && poor < 0.5 && rich <= 1.0 && poor >= 0.0)
  }

  test("languageId picks the profile with most distinct marker words") {
    val samples = Seq(
      "the cat is in the house and it is warm" -> "en",
      "el perro es un animal que vive en la casa" -> "es",
      "der hund ist ein tier und die katze ist nicht" -> "de",
      "le chat est un animal et les chiens pour la maison" -> "fr",
      "qwerty zxcvb asdfgh" -> "und")
    samples.foreach { case (text, expected) =>
      assert(one(TextFunctions.languageId(lit(text))).getString(0) == expected,
        s"for: $text")
    }
  }

  test("tokenStats expression == composed split/distinct/regexp forms") {
    // Field semantics of split(text, "\\s+") are subtle: leading AND
    // trailing separator runs contribute empty fields (Java limit=-1),
    // empty text is one empty field, and the empty field counts as a
    // distinct token. The single-pass expression must agree exactly.
    val texts = Seq(
      "", " ", "  ", "a", " a", "a ", " a ", "a  b", "the the a x",
      "a\tb\nc\rd", "the", " the ", "x the a the y",
      (1 to 80).map(i => s"w${i % 9}").mkString(" "))
    val df = texts.toDF("text")
    val stop = Seq("the", "a")
    val out = df.select(
      TextFunctions.tokenStats(col("text"), stop).as("st"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.distinctTokenCount(col("text")).as("u"),
      TextFunctions.qualityScoreComposed(col("text"), stop).as("qRef"),
      TextFunctions.qualityScore(col("text"), stop).as("qFast"),
      TextFunctions.stopwordRatio(col("text"), stop)
        .as("sRef")).rows
    out.zip(texts).foreach { case (r, t) =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(1), s"n_tokens for '$t'")
      assert(st.getInt(1) == r.getInt(2), s"n_uniq for '$t'")
      assert(r.getDouble(4) == r.getDouble(3), s"quality for '$t'")
      assert(st.getInt(2).toDouble / st.getInt(0) == r.getDouble(5),
        s"stop ratio for '$t'")
    }
    // and over the real corpus: bit-identical quality scores
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      TextFunctions.qualityScore(col("text"), stop).as("fast"),
      TextFunctions.qualityScoreComposed(col("text"), stop).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("languageId expression == composed array_intersect formulation") {
    // The single-pass expression must agree with the executable spec on
    // edge cases: empty text, leading/trailing/mixed whitespace, repeated
    // marker words (distinct semantics), cross-language shared words
    // ("la"/"de"/"un"), exact ties (alphabetical winner), CJK markers.
    val texts = Seq(
      "", " ", "the the the the", "la la la",
      "  the cat is in la maison  ",
      "de la que un es el y en",          // es/fr shared words
      "the a\tof and\nto in is that it for",
      "el la de que y en un una los es",
      "the 的 是 of 了 and 在 to 我",      // en vs zh tie shapes
      "un une est", "qwerty",
      (1 to 50).map(i => s"w$i the of and").mkString(" "))
    val df = texts.toDF("text")
    val out = df.select(
      TextFunctions.languageId(col("text")).as("fast"),
      TextFunctions.languageIdComposed(col("text")).as("ref")).rows
    out.zip(texts).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch for '$t': fast=${r.getString(0)} ref=${r.getString(1)}")
    }
    // and over the real corpus
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      TextFunctions.languageId(col("text")).as("fast"),
      TextFunctions.languageIdComposed(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("rollingHash is bit-identical to the aggregate+xxhash64 HOF fold") {
    val df = Seq("a b c", "  leading space", "onetoken", "", "x \t y\nz")
      .toDF("text")
    val out = df.select(
      TextFunctions.rollingHash(col("text")).as("fast"),
      aggregate(TextFunctions.tokens(col("text")), lit(0L),
        (acc, t) => xxhash64(acc, t)).as("ref")).rows
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("regexp stopword count matches the filter-lambda formulation") {
    val stop = Seq("the", "a")
    val df = Seq("the cat a hat", "a", "theater the", "aa the  a", " the", "ab")
      .toDF("text")
    val out = df.select(
      TextFunctions.stopwordRatio(col("text"), stop).as("fast"),
      (size(filter(TextFunctions.tokens(col("text")),
        t => t.isInCollection(stop))).cast("double") /
        size(TextFunctions.tokens(col("text")))).as("ref")).rows
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fast=${r.getDouble(0)} ref=${r.getDouble(1)}"))
  }

  test("fingerprint is whitespace-insensitive, rollingHash is order-sensitive") {
    assert(one(TextFunctions.fingerprint(lit("a  b\tc"))) ==
      one(TextFunctions.fingerprint(lit("a b c"))))
    assert(one(TextFunctions.rollingHash(lit("a b c"))) !=
      one(TextFunctions.rollingHash(lit("c b a"))))
    assert(one(TextFunctions.rollingHash(lit("a b c"))) ==
      one(TextFunctions.rollingHash(lit("a b c"))))
  }

  test("tokenChunks: windows, overlap, tail rules, both eval paths") {
    import graft.expressions.GraftFunctions
    def chunksOf(toks: Seq[String], size: Int, stride: Int): Seq[String] =
      spark.range(1).select(
        GraftFunctions.tokenChunks(typedLit(toks), size, stride).as("c"))
        .rows.head.getSeq[String](0)
    val t10 = (1 to 10).map(i => s"w$i")
    // stride < size: 10-token overlap windows; NO fully-overlapped tail
    assert(chunksOf(t10, 4, 2) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    // stride == size: exact partition — concatenation rebuilds the doc
    assert(chunksOf(t10, 5, 5).mkString(" ") == t10.mkString(" "))
    // partial tail kept; short doc = one chunk; empty = none
    assert(chunksOf(t10, 4, 4) == Seq(
      "w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(chunksOf(Seq("a", "b"), 50, 40) == Seq("a b"))
    assert(chunksOf(Seq.empty[String], 4, 2).isEmpty)
    // every token appears in at least one chunk (coverage)
    val covered = chunksOf(t10, 7, 3).flatMap(_.split(" ")).toSet
    assert(covered == t10.toSet)
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.TokenChunks
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val ev = TokenChunks(
        Literal.create(t10, ArrayType(StringType)), 4, 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(ev.toObjectArray(StringType).map(_.toString).toSeq ==
      chunksOf(t10, 4, 2))
    // SQL registration with literal size/stride
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_token_chunks(array('a','b','c'), 2, 1) AS c")
      .rows.head.getSeq[String](0)
    assert(viaSql == Seq("a b", "b c"))
  }
}
