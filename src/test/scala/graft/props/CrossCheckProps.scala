package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.{AsOfJoin, NearDup}

/** Randomized cross-checks: the optimized operators must agree with naive
  * reference formulations on arbitrary inputs. */
object CrossCheckProps extends Properties("graft.crosscheck") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asofGen = for {
    nLeft <- Gen.choose(1, 15)
    nRight <- Gen.choose(0, 15)
    keys <- Gen.listOfN(nLeft + nRight, Gen.oneOf("A", "B"))
    times <- Gen.listOfN(nLeft + nRight, Gen.choose(0L, 20L))
  } yield {
    val rows = keys.zip(times).zipWithIndex.map { case ((k, t), i) =>
      (i.toLong, k, new java.sql.Timestamp(t * 1000), i.toDouble)
    }
    (rows.take(nLeft), rows.drop(nLeft))
  }

  property("leftAsOf == naive join + max-ts pick") =
    Prop.forAll(asofGen) { case (l, r) =>
      val left = l.toDF("id", "k", "ts", "v").drop("v")
      val right = r.toDF("id", "k", "ts", "v")
        .withColumnRenamed("id", "rid")
      val fast = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts",
          Seq("v"), col("id"), col("rid"))
        .collect().map(rw => rw.getLong(0) -> Option(rw.get(3))).toMap
      // naive: all right rows with ts <= left.ts, pick max (ts, rid)
      val naive = l.map { case (id, k, ts, _) =>
        val candidates = r.filter(rr => rr._2 == k && !rr._3.after(ts))
        id -> candidates.sortBy(rr => (rr._3.getTime, rr._1)).lastOption.map(_._4)
      }.toMap
      fast == naive
    }

  private val docsGen = for {
    n <- Gen.choose(2, 8)
    texts <- Gen.listOfN(n,
      Gen.listOfN(8, Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("ngramJaccardPairs == brute-force jaccard over shingle sets") =
    Prop.forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val fast = NearDup.ngramJaccardPairs(df, "doc_id", "text",
          shingleSize = 2, threshold = 0.3, maxDocFreq = 100)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      def shingleSet(t: String) =
        t.split(" ").sliding(2).map(_.mkString(" ")).toSet
      val naive = (for {
        (ia, ta) <- docs
        (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta)
        sb = shingleSet(tb)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= 0.3
      } yield (ia, ib) -> j).toMap
      fast.keySet == naive.keySet &&
        fast.forall { case (k, v) => math.abs(v - naive(k)) < 1e-12 }
    }

  property("minhashPairs is a subset of exact pairs and never under-reports jaccard") =
    Prop.forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val lsh = NearDup.minhashPairs(df, "doc_id", "text",
          shingleSize = 2, bands = 8, rowsPerBand = 2, threshold = 0.3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val exact = NearDup.ngramJaccardPairs(df, "doc_id", "text",
          shingleSize = 2, threshold = 0.3, maxDocFreq = 100)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      lsh.keySet.subsetOf(exact.keySet) &&
        lsh.forall { case (k, v) => math.abs(v - exact(k)) < 1e-12 }
    }

  // Random text with every `\s` separator class member, runs of
  // separators, and boundary separators — the adversarial surface for the
  // single-pass text expressions' split(limit=-1) field semantics.
  private val rawTextGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.oneOf("the", "a", "of", "la", "w1", "w2", "x"),
    4 -> Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  ", " \t "))
  ).map(_.mkString)

  property("WordShingles expression == transform/slice HOF shingles") = {
    val tokArrGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d")).map(_.toSeq)
    Prop.forAll(tokArrGen, Gen.choose(2, 4)) { (toks, n) =>
      val df = Seq(Tuple1(toks)).toDF("toks")
      val out = df.select(
        graft.expressions.GraftFunctions.wordShingles(col("toks"), n).as("fast"),
        NearDup.shingles(col("toks"), n).as("ref")).collect().head
      out.getSeq[String](0) == out.getSeq[String](1)
    }
  }

  property("TokenStats / languageId expressions == composed forms on raw text") =
    Prop.forAll(rawTextGen) { text =>
      import graft.functions.TextFunctions
      val stop = Seq("the", "a")
      val df = Seq(Tuple1(text)).toDF("text")
      val r = df.select(
        TextFunctions.tokenStats(col("text"), stop).as("st"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.distinctTokenCount(col("text")).as("u"),
        TextFunctions.qualityScore(col("text"), stop).as("qf"),
        TextFunctions.qualityScoreComposed(col("text"), stop).as("qr"),
        TextFunctions.languageId(col("text")).as("lf"),
        TextFunctions.languageIdComposed(col("text")).as("lr")).collect().head
      val st = r.getStruct(0)
      (Prop(st.getInt(0) == r.getInt(1)) :| s"n_tokens '$text'") &&
        (Prop(st.getInt(1) == r.getInt(2)) :| s"n_uniq '$text'") &&
        (Prop(r.getDouble(3) == r.getDouble(4)) :| s"quality '$text'") &&
        (Prop(r.getString(5) == r.getString(6)) :| s"lang '$text'")
    }
}
