package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher repetition signals (duplicate segments, top n-gram share,
  * duplicated n-gram coverage) — golden values, edge semantics, a
  * brute-force reference cross-check, and interpreted==codegen. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c.as("v")).rows.head

  private def dupSeg(text: String, sep: String): (Any, Any) = {
    val r = one(TextFunctions.dupSegmentStats(lit(text), sep)).getStruct(0)
    (if (r.isNullAt(0)) null else r.getLong(0),
      if (r.isNullAt(1)) null else r.getLong(1))
  }

  private def topN(text: String, n: Int): Any = {
    val r = one(TextFunctions.topNgramCharPpm(lit(text), n))
    if (r.isNullAt(0)) null else r.getLong(0)
  }

  private def dupN(text: String, n: Int): Any = {
    val r = one(TextFunctions.dupNgramCharPpm(lit(text), n))
    if (r.isNullAt(0)) null else r.getLong(0)
  }

  test("dupSegmentStats goldens: dup fraction and char fraction") {
    // a,b,a,c: 1 of 4 segments is a repeat; 1 of 4 chars
    assert(dupSeg("a\nb\na\nc", "\n") == (250000L, 250000L))
    // char weighting differs from count weighting on uneven segments:
    // aa,b,aa -> dup 1/3 segs but 2/5 chars
    assert(dupSeg("aa\nb\naa", "\n") == (333333L, 400000L))
    // no duplicates -> 0; all same -> (k-1)/k
    assert(dupSeg("x\ny\nz", "\n") == (0L, 0L))
    assert(dupSeg("q\nq\nq\nq", "\n") == (750000L, 750000L))
  }

  test("dupSegmentStats edge semantics: empties dropped, multi-char " +
      "separator is literal left-to-right non-overlapping, no " +
      "segments -> NULL") {
    // consecutive separators produce no empty segments
    assert(dupSeg("a\n\n\na", "\n") == (500000L, 500000L))
    // "x<nl><nl><nl>y" on sep <nl><nl>: first match consumes chars 2-3,
    // leaving "x" and "\ny" - the leftover newline stays IN the segment
    assert(dupSeg("x\n\n\ny", "\n\n") == (0L, 0L))
    val r = one(TextFunctions.dupSegmentStats(lit("x\n\n\ny"), "\n\n"))
      .getStruct(0)
    assert(!r.isNullAt(0))
    // only separators, or empty text -> NULL ppm
    assert(dupSeg("\n\n\n", "\n") == (null, null))
    assert(dupSeg("", "\n") == (null, null))
  }

  test("topNgramCharPpm goldens, short-doc zero, empty NULL") {
    // tokens a b a b c; best 2-gram "a b" count 2, token chars 2;
    // 2*2*1e6/5
    assert(topN("a b a b c", 2) == 800000L)
    // whole text one repeated bigram pair: 2*2/4
    assert(topN("a b a b", 2) == 1000000L)
    // count beats char length: "w w"(x2, 2 chars) wins over the longer
    // unique grams ("w aa", "aa bb"); total token chars 1+1+1+2+2 = 7
    assert(topN("w w w aa bb", 2) ==
      2L * 2L * 1000000L / 7L)
    // fewer tokens than n -> 0 (tokens exist, no grams)
    assert(topN("only", 2) == 0L)
    assert(topN("a b c", 4) == 0L)
    // no tokens at all -> NULL
    assert(topN("", 2) == null)
    assert(topN("   \t  ", 3) == null)
  }

  test("dupNgramCharPpm goldens: overlapping coverage counted once") {
    // tokens a b c a b c d: duplicated 2-grams "a b" and "b c" cover
    // positions 0-5 (6 tokens, 6 chars) of 7
    assert(dupN("a b c a b c d", 2) == 6L * 1000000L / 7L)
    // no repeats -> 0; full doubling -> full coverage
    assert(dupN("p q r s t", 2) == 0L)
    assert(dupN("m n o m n o", 3) == 1000000L)
    assert(dupN("one", 5) == 0L)
    assert(dupN("", 5) == null)
  }

  test("characters are code points, not UTF-16 units") {
    // U+1D54F is a surrogate pair in UTF-16 but ONE code point
    val astral = "𝕏"
    // segments: astral, bb, astral -> dup chars 1 of 4
    assert(dupSeg(s"$astral\nbb\n$astral", "\n") == (333333L, 250000L))
    // best 2-gram "<astral> x" twice: token chars 2, total 6
    assert(topN(s"$astral x $astral x yy", 2) == 2L * 2L * 1000000L / 6L)
  }

  test("gopherRepetitionOk: passes varied text, drops each published " +
      "failure mode, passes empty/degenerate text (NULL signals)") {
    def ok(text: String): Boolean =
      one(TextFunctions.gopherRepetitionOk(lit(text))).getBoolean(0)
    // varied natural-ish text under every threshold
    val varied = (1 to 60).map(i => s"tok$i word$i item$i").mkString("\n")
    assert(ok(varied))
    // duplicate-line failure: same line 10 times (dup 9/10 > 0.30)
    assert(!ok((1 to 10).map(_ => "same line").mkString("\n")))
    // top-2-gram failure on otherwise line-clean text: one bigram
    // dominates > 20% of chars
    assert(!ok(Seq.fill(40)("ab ab").mkString(" ")))
    // duplicated-5-gram failure: a long doubled run inside unique text
    val run = (1 to 20).map(i => s"u$i").mkString(" ")
    assert(!ok(s"$run $run"))
    // NULL signals pass through (no tokens / no segments)
    assert(ok(""))
    assert(ok("   \n  \n "))
    // the DocPipeline stage wires it in and reports retention
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 60).map(i => s"alpha$i beta$i gamma$i the a").mkString("\n")),
      // 'the a' keeps doc 2 past the LANGUAGE stage so the drop is
      // attributable to the repetition gate, not langid
      (2L, (1 to 10).map(_ => "same line the a is").mkString("\n")))
      .toDF("doc_id", "text")
    val rep = graft.operators.DocPipeline.clean(docs, "doc_id", "text",
      graft.operators.DocPipeline.Config(repetitionFilter = true))
    val stages = rep.stages.toMap
    assert(stages("repetition_filter") == 1L,
      s"stages=${rep.stages}")
    assert(rep.cleaned.select("doc_id").rows.map(_.getLong(0)) == Seq(1L))
  }

  test("brute-force reference cross-check on pseudo-random token " +
      "streams (interpreted eval == codegen eval == reference)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.{DupNgramCharPpm, TopNgramCharPpm}

    def refTop(tokens: Seq[String], n: Int): Any = {
      if (tokens.isEmpty) return null
      val totCh = tokens.map(t => t.codePointCount(0, t.length).toLong).sum
      val gs = tokens.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      if (gs.isEmpty) return 0L
      // toSeq first: mapping the Map directly would collapse grams
      // sharing a count (tuples become key -> value) and lose the max
      val counts = gs.groupBy(identity).toSeq.map { case (g, o) =>
        (o.size.toLong, g.codePointCount(0, g.length).toLong - (n - 1)) }
      val (c, ch) = counts.max
      c * ch * 1000000L / totCh
    }

    def refDup(tokens: Seq[String], n: Int): Any = {
      if (tokens.isEmpty) return null
      val totCh = tokens.map(t => t.codePointCount(0, t.length).toLong).sum
      val gs = tokens.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .toIndexedSeq
      if (gs.isEmpty) return 0L
      val counts = gs.groupBy(identity).view.mapValues(_.size).toMap
      val covered = gs.zipWithIndex.collect {
        case (g, i) if counts(g) >= 2 => (i until i + n)
      }.flatten.toSet
      val covCh = covered.toSeq.map(p =>
        tokens(p).codePointCount(0, tokens(p).length).toLong).sum
      covCh * 1000000L / totCh
    }

    val vocab = Array("a", "bb", "ccc", "d", "ee")
    val rnd = new scala.util.Random(421)
    (1 to 60).foreach { _ =>
      val k = rnd.nextInt(25)
      val tokens = Seq.fill(k)(vocab(rnd.nextInt(vocab.length)))
      val text = tokens.mkString(" ")
      Seq(2, 3, 5).foreach { n =>
        val interpTop = Option(TopNgramCharPpm(Literal(text), n).eval(null))
          .orNull
        val interpDup = Option(DupNgramCharPpm(Literal(text), n).eval(null))
          .orNull
        assert(interpTop == refTop(tokens, n),
          s"top n=$n tokens=$tokens")
        assert(interpDup == refDup(tokens, n),
          s"dup n=$n tokens=$tokens")
        // codegen path (df.select) agrees with interpreted eval
        assert(topN(text, n) == interpTop, s"codegen top n=$n $tokens")
        assert(dupN(text, n) == interpDup, s"codegen dup n=$n $tokens")
      }
    }
  }

  test("fused GopherRepetitionStats == the thirteen standalone " +
      "expressions, field for field, on newline-rich random corpora") {
    val fields =
      Seq("dup_line_ppm", "dup_line_char_ppm", "dup_para_ppm",
        "dup_para_char_ppm", "top2_ppm", "top3_ppm", "top4_ppm") ++
        (5 to 10).map(n => s"dup${n}_ppm")
    def standalone(text: String): Seq[Any] = {
      val line = dupSeg(text, "\n"); val para = dupSeg(text, "\n\n")
      Seq(line._1, line._2, para._1, para._2) ++
        (2 to 4).map(n => topN(text, n)) ++
        (5 to 10).map(n => dupN(text, n))
    }
    def fused(text: String): Seq[Any] = {
      val r = one(TextFunctions.gopherRepetitionStats(lit(text)))
        .getStruct(0)
      fields.indices.map(i => if (r.isNullAt(i)) null else r.getLong(i))
    }
    // separators appear IN the vocab so line/para structure is random
    val vocab = Array("a", "bb", "ccc", "d\n", "ee\n\n", "\n")
    val rnd = new scala.util.Random(733)
    val texts = Seq("", "   \n ", "x") ++ (1 to 40).map { _ =>
      Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    texts.foreach { text =>
      val (f, s) = (fused(text), standalone(text))
      assert(f == s,
        s"fused=$f standalone=$s text=${text.replace("\n", "\\n")}")
    }
  }
}
