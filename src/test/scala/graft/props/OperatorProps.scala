package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.{Cleanse, Dedup}
import graft.functions.TextFunctions

/** ScalaCheck property tests for the invariants SURVEY.md §5 calls out:
  * dedup outputs are unique and a subset of the input; cleanse filters are
  * idempotent; normalization arithmetic is exact. */
object OperatorProps extends Properties("graft.operators") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    user <- Gen.choose(0L, 5L)
    typ <- Gen.oneOf("a", "b", "c")
    id <- Gen.choose(0L, 1000000L)
    value <- Gen.choose(-100.0, 100.0)
  } yield (id, user, typ, value)

  private val rowsGen = Gen.listOfN(60, rowGen).map(_.distinctBy(_._1))

  property("dedup.byKey: unique keys, subset of input, deterministic") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("event_id", "user_id", "event_type", "value")
      val out = Dedup.byKey(df, Seq("user_id", "event_type"), Seq(col("event_id")))
        .collect().toSeq
      val keys = out.map(r => (r.getLong(1), r.getString(2)))
      val inputIds = rows.map(_._1).toSet
      val expectedKeys = rows.map(r => (r._2, r._3)).distinct.toSet
      keys.distinct.size == keys.size &&
        out.forall(r => inputIds.contains(r.getLong(0))) &&
        keys.toSet == expectedKeys
    }

  property("cleanse.rangeRules is idempotent") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(-50.0, 150.0))) { vals =>
      val df = vals.toDF("v")
      val rules = Seq(col("v").between(0, 100))
      val once = Cleanse.rangeRules(df, rules)
      val twice = Cleanse.rangeRules(once, rules)
      once.count() == twice.count() &&
        once.collect().map(_.getDouble(0)).forall(v => v >= 0 && v <= 100)
    }

  property("tokenCount >= distinctTokenCount >= 1 for non-empty text") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("w1", "w2", "w3", "w4"))) { words =>
      val text = words.mkString(" ")
      val r = spark.range(1).select(
        TextFunctions.tokenCount(lit(text)).as("n"),
        TextFunctions.distinctTokenCount(lit(text)).as("d")).collect().head
      r.getInt(0) == words.size && r.getInt(1) == words.distinct.size &&
        r.getInt(0) >= r.getInt(1) && r.getInt(1) >= 1
    }

  // Hot-key aggregation skew tool: the salted two-phase form must be
  // BIT-identical to the plain aggregate on arbitrary data (the decimal
  // accumulation makes the claim exact, not approximate).
  property("int8 quantization: positive-scale invariance, range, idempotent shape") =
    Prop.forAll(
      Gen.choose(1, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-10.0, 10.0))),
      Gen.choose(0.001, 1000.0)) { (v, c) =>
      import spark.implicits._
      def q(xs: Seq[Double]): Seq[Byte] =
        Seq(xs).toDF("v")
          .select(graft.expressions.GraftFunctions.quantizeInt8(col("v")))
          .collect().head.getSeq[Byte](0)
      val base = q(v)
      val scaled = q(v.map(_ * c))
      // cosine's scale invariance holds through quantization because the
      // quantizer itself is scale-invariant (m scales with the vector)
      Prop(base == scaled) :| s"q(v) = $base but q(${c}·v) = $scaled" &&
        Prop(base.forall(b => b >= -127 && b <= 127)) :| "range exceeded" &&
        Prop(v.forall(_ == 0.0) || base.exists(b => b == 127 || b == -127))
          .:|("max-|x| element must hit ±127")
    }

  property("saltedSumCount == plain sum/count bit-for-bit") = {
    import graft.operators.Scale
    val rowsGen = Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("hot", "hot", "hot", "cold")   // skew toward one key
      v <- Gen.chooseNum(-10000.0, 10000.0).map(x => math.rint(x * 100) / 100)
    } yield (k, v))
    Prop.forAll(rowsGen, Gen.choose(1, 16)) { (rows, buckets) =>
      val df = rows.toDF("k", "value")
      val salted = Scale.saltedSumCount(df, Seq("k"), "value", buckets)
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val plain = df.groupBy(col("k"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      salted == plain
    }
  }

  // --- brute-force cross-checks for the round-4 text operators ---

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    docs <- Gen.listOfN(n,
      Gen.nonEmptyListOf(Gen.oneOf("u", "v", "w", "x", "y"))
        .map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("spanDedup == brute-force first-occurrence model") =
    Prop.forAll(corpusGen, Gen.choose(1, 3)) { (docs, span) =>
      val out = Dedup
        .spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", span)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      // model: cut every doc into spans, keep first (doc, idx) occurrence
      // of each distinct span, reassemble
      val spans = docs.flatMap { case (id, t) =>
        t.split("\\s+").grouped(span).zipWithIndex
          .map { case (w, i) => (id, i.toLong, w.mkString(" ")) }
      }
      val seen = scala.collection.mutable.Set.empty[String]
      val kept = spans.sortBy(s => (s._1, s._2))
        .filter(s => seen.add(s._3))
      val want = kept.groupBy(_._1).map { case (id, ss) =>
        id -> ((ss.sortBy(_._2).map(_._3).mkString(" "), ss.size.toLong))
      }
      Prop(out == want) :| s"got $out want $want"
    }

  property("runDedup == brute-force maximal-run model") =
    Prop.forAll(corpusGen, Gen.choose(1, 3), Gen.choose(1, 3)) {
      (docs, span, minRun) =>
        val out = Dedup
          .runDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
            span, minRun)
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
          .toMap
        // model: dup-mark every non-first span instance, group consecutive
        // dup spans per doc into runs, drop runs of >= minRun spans
        val spans = docs.flatMap { case (id, t) =>
          t.split("\\s+").grouped(span).zipWithIndex
            .map { case (w, i) => (id, i.toLong, w.mkString(" ")) }
        }
        val seen = scala.collection.mutable.Set.empty[String]
        val flagged = spans.sortBy(s => (s._1, s._2))
          .map(s => (s._1, s._2, s._3, !seen.add(s._3)))
        val kept = flagged.groupBy(_._1).toSeq.flatMap { case (_, ss) =>
          // group consecutive same-flag spans (positions are contiguous)
          val runs = ss.sortBy(_._2).foldLeft(
            List.empty[List[(Long, Long, String, Boolean)]]) {
            case (acc @ (run :: rest), s) if run.head._4 == s._4 =>
              (s :: run) :: rest
            case (acc, s) => List(s) :: acc
          }
          runs.flatMap { run =>
            if (run.head._4 && run.size >= minRun) Nil else run
          }
        }
        val want = kept.groupBy(_._1).map { case (id, ss) =>
          id -> ((ss.sortBy(_._2).map(_._3).mkString(" "), ss.size.toLong))
        }
        Prop(out == want) :| s"got $out want $want"
    }

  property("vocab.truncateToTopK == brute-force top-k rewrite") =
    Prop.forAll(corpusGen, Gen.choose(1, 4)) { (docs, k) =>
      val out = graft.operators.Vocab
        .truncateToTopK(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      val counts = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
        .map { case (t, o) => t -> o.size }
      val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }
        .take(k).map(_._1).toSet
      val want = docs.map { case (id, t) =>
        val toks = t.split("\\s+").toSeq
        val rewritten = toks.map(w => if (vocab(w)) w else "<unk>")
        id -> ((rewritten.mkString(" "),
          rewritten.count(_ == "<unk>").toLong))
      }.toMap
      Prop(out == want) :| s"got $out want $want"
    }

  property("lmScore.bigramLogProb == brute-force model (within one 6dp ulp)") =
    Prop.forAll(corpusGen) { docs =>
      val out = graft.operators.LmScore
        .bigramLogProb(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val bgs = docs.flatMap { case (id, t) =>
        t.split("\\s+").sliding(2).filter(_.length == 2)
          .map(p => (id, p(0), p.mkString(" "))).toSeq
      }
      val c12 = bgs.groupBy(_._3).map { case (b, o) => b -> o.size }
      val c1 = bgs.groupBy(_._2).map { case (w, o) => w -> o.size }
      val want = bgs.groupBy(_._1).map { case (id, rows) =>
        val lps = rows.map(r => math.log(c12(r._3).toDouble / c1(r._2)))
        id -> ((rows.size.toLong, lps.sum / lps.size))
      }
      val keysMatch = out.keySet == want.keySet
      // sum order differs between engines/model: compare to one ulp of
      // the 6dp export grid instead of exactly
      Prop(keysMatch && want.forall { case (id, (n, lp)) =>
        out(id)._1 == n && math.abs(out(id)._2 - lp) <= 1e-6 + 1e-9
      }) :| s"got $out want $want"
    }

  property("keywords.topTerms: scores exact, per-doc k bound, ranking correct") =
    Prop.forAll(corpusGen, Gen.choose(1, 3)) { (docs, k) =>
      val out = graft.operators.Keywords
        .topTerms(docs.toDF("doc_id", "text"), "doc_id", "text", k,
          minTokenLen = 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val n = docs.size.toLong
      val tf = docs.flatMap { case (id, t) =>
        t.split("\\s+").map(w => (id, w))
      }.groupBy(identity).map { case (key, o) => key -> o.size.toLong }
      val dfreq = tf.keys.groupBy(_._2).map { case (w, o) => w -> o.size.toLong }
      val want = tf.toSeq
        .map { case ((id, w), c) => (id, w, c, c * n * 1000000L / dfreq(w)) }
        .groupBy(_._1).flatMap { case (_, rows) =>
          rows.sortBy(r => (-r._4, r._2)).take(k)
        }.toSet
      Prop(out.toSet == want) :| s"got ${out.toSet} want $want"
    }
}
