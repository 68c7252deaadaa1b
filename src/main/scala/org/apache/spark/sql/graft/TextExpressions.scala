// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the ExpectsInputTypes contract and the
// Column<->Expression bridge are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Order-sensitive rolling hash over a token array: the chained-xxhash64
  * fold `acc_i = xxhash64(acc_{i-1}, token_i)` (acc_0 = 0) as ONE codegen'd
  * expression. The `aggregate` higher-order formulation computes the same
  * values but evaluates its lambda interpreted per element with boxing —
  * this keeps the whole corpus fingerprint scan inside WholeStageCodegen.
  * Bit-identical to `aggregate(tokens, 0L, (acc, t) => xxhash64(acc, t))`:
  * each step is hashLong(acc, 42) then hashUnsafeBytes(token, that). */
case class RollingXxHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_xxhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = XxHash64Function.hash(acc, LongType, 42L)
      // mirror xxhash64's null handling: a null element leaves the token
      // step out but the accumulator step still applies
      if (!arr.isNullAt(i)) {
        acc = XxHash64Function.hash(arr.getUTF8String(i), StringType, acc)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $xxh.hashLong($acc, 42L);
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $t = $a.getUTF8String($i);
         |    $acc = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(),
         |      $t.numBytes(), $acc);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingXxHash64 =
    copy(newChild)
}

/** Word n-gram shingles of a token array as ONE codegen'd projection:
  * out[i] = tokens[i..i+n-1] joined by a single space, for
  * i in [0, len-n]. Shorter-than-n docs yield an empty array.
  *
  * Replaces the window formulation (posexplode → lead(i) over
  * (id, pos)) used when only built-ins were allowed: that route
  * hash-shuffles and sorts EVERY shingle row just to see the next n-1
  * tokens, while this is a per-row loop — at corpus scale the minhash
  * signature aggregation then partial-combines map-side and the shuffle
  * carries k longs per doc instead of every shingle. (The `transform` +
  * `slice` HOF route computes the same values but interpreted.)
  * Null tokens are skipped inside a shingle, matching concat_ws. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  require(n >= 2, "use the token array directly for n <= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val count = math.max(0, arr.numElements() - n + 1)
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var i = 0
    while (i < count) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(i + j)) parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toIndexedSeq)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("shingleSep",
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        "UTF8String")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $count = $a.numElements() - ${n - 1};
         |if ($count < 0) $count = 0;
         |UTF8String[] $out = new UTF8String[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  UTF8String[] $parts = new UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Fixed-size token windows with a stride — the context-length chunking a
  * training corpus needs ([[WordShingles]] with stride and a partial tail
  * chunk; a document shorter than `size` yields one chunk). Chunk i
  * covers tokens [i·stride, i·stride + size); the last chunk may be
  * short; overlap = size − stride. A window is emitted only if it
  * contributes at least one token beyond the previous window's coverage
  * (a fully-overlapped tail would duplicate training data), so the chunk
  * count is ⌈max(1, n − size + stride)/stride⌉. Same scan-side
  * per-row-loop rationale as WordShingles — the explode emits finished
  * chunks with no exchange and no interpreted HOF lambdas. */
case class TokenChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  require(size >= 1 && stride >= 1 && stride <= size,
    s"need 1 <= stride <= size, got size=$size stride=$stride")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_chunks"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val count =
      if (n == 0) 0 else (math.max(0, n - size + stride - 1) / stride) + 1
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var i = 0
    while (i < count) {
      val start = i * stride
      val len = math.min(size, n - start)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var j = 0
      while (j < len) {
        if (!arr.isNullAt(start + j)) parts(j) = arr.getUTF8String(start + j)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toIndexedSeq)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("chunkSep",
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        "UTF8String")
      val n = ctx.freshName("n")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val start = ctx.freshName("start")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |int $count = $n == 0 ? 0
         |  : ((java.lang.Math.max(0, $n - $size + $stride - 1) / $stride) + 1);
         |UTF8String[] $out = new UTF8String[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  int $start = $i * $stride;
         |  int $len = java.lang.Math.min($size, $n - $start);
         |  UTF8String[] $parts = new UTF8String[$len];
         |  for (int $j = 0; $j < $len; $j++) {
         |    $parts[$j] = $a.isNullAt($start + $j)
         |      ? null : $a.getUTF8String($start + $j);
         |  }
         |  $out[$i] = UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

/** Language ID over raw text in ONE pass: tokenize by the exact `\s`
  * separator class `split` uses, look each token up in a static
  * word→(lang, bit) table, and count DISTINCT profile words per language
  * as a popcount over per-language bitmasks. Identical semantics to the
  * composed form (`size(array_intersect(array_distinct(split(text)),
  * profile))` per language, argmax with alphabetical tie-break, 'und'
  * when every score is 0) — but no token array, no distinct pass, no 5
  * intersect scans: one linear walk per row.
  *
  * `profiles` must be (lang → words) sorted by lang; ties break toward
  * the first (alphabetically smallest) language, matching the composed
  * CASE chain. */
case class LanguageIdExpr(child: Expression,
    profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  require(profiles.map(_._1) == profiles.map(_._1).sorted,
    "profiles must be sorted by language for the deterministic tie-break")
  // The per-language hit set is an Int bitmask indexed by word position
  // and the packed hit is (langIdx << 8 | wordIdx): beyond these bounds
  // Java's mod-32 shift would silently alias distinct words into the
  // same bit and the packing would corrupt the language index — fail
  // construction instead of scoring wrong.
  require(profiles.forall(_._2.size <= 32),
    "language profiles are limited to 32 words (Int bitmask scoring)")
  require(profiles.size <= (1 << 23),
    "at most 2^23 language profiles (packed lang<<8 hit encoding)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_language_id"

  @transient private lazy val langsUtf8 =
    profiles.map(p => org.apache.spark.unsafe.types.UTF8String.fromString(p._1)).toArray
  @transient private lazy val und =
    org.apache.spark.unsafe.types.UTF8String.fromString("und")
  // token -> packed (langIdx << 8 | wordIdx) hits; a word may appear in
  // several languages' profiles (e.g. "la" in es and fr)
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    profiles.zipWithIndex.foreach { case ((_, words), li) =>
      words.zipWithIndex.foreach { case (w, wi) =>
        m.computeIfAbsent(w, _ => new java.util.ArrayList[Integer]())
          .add(Integer.valueOf((li << 8) | wi))
      }
    }
    val out = new java.util.HashMap[String, Array[Int]]()
    m.forEach((k, v) => out.put(k, v.toArray(new Array[Integer](0)).map(_.intValue())))
    out
  }

  /** `\s` in an un-flagged Java regex is exactly [ \t\n\x0B\f\r]. */
  private def isSep(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  def doEval(input: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val s = input.toString
    val masks = new Array[Int](profiles.length)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isSep(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSep(s.charAt(i))) i += 1
      if (i > start) {
        val hits = lookup.get(s.substring(start, i))
        if (hits != null) {
          var h = 0
          while (h < hits.length) {
            masks(hits(h) >> 8) |= 1 << (hits(h) & 0xFF)
            h += 1
          }
        }
      }
    }
    var best = 0
    var bi = -1
    var li = 0
    while (li < masks.length) {
      val score = Integer.bitCount(masks(li))
      if (score > best) { best = score; bi = li }
      li += 1
    }
    if (best == 0) und else langsUtf8(bi)
  }

  override def nullSafeEval(input: Any): Any =
    doEval(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The scan loop lives in this (JIT-compiled) class; codegen just calls
    // it — keeps the projection inside WholeStageCodegen without inlining
    // a giant method into the generated source.
    val ref = ctx.addReferenceObj("langIdExpr", this,
      classOf[LanguageIdExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.doEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): LanguageIdExpr =
    copy(child = newChild)
}

/** Token statistics over raw text in ONE pass:
  * struct(n_tokens, n_uniq, n_stop) with EXACTLY the semantics of the
  * composed forms —
  *  - n_tokens = size(split(text, "\\s+"))  (Java limit=-1 semantics:
  *    leading AND trailing separator runs contribute empty fields, and
  *    empty text is one empty field),
  *  - n_uniq  = size(array_distinct(split(...))) (the empty field counts),
  *  - n_stop  = occurrences of tokens equal to a stopword (the
  *    regexp_count boundary formulation; empty fields never match).
  * One walk, one small hash set — no token array, no distinct pass, no
  * regex scan. */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "graft_token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  private def isSep(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  def doEval(input: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toString
    val len = s.length
    val seen = new java.util.HashSet[String]()
    var n = 0
    var stop = 0
    var idx = 0
    var done = false
    while (!done) {
      val start = idx
      while (idx < len && !isSep(s.charAt(idx))) idx += 1
      val tok = s.substring(start, idx)
      n += 1
      seen.add(tok)
      if (stopSet.contains(tok)) stop += 1
      if (idx >= len) done = true
      else {
        while (idx < len && isSep(s.charAt(idx))) idx += 1
        if (idx >= len) { n += 1; seen.add(""); done = true }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, seen.size(), stop))
  }

  override def nullSafeEval(input: Any): Any =
    doEval(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStatsExpr", this,
      classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.doEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** Column-level API for the text expressions. */
/** Raw-DEFLATE compressed length of a string's UTF-8 bytes as ONE
  * codegen'd expression — the compression-ratio quality signal
  * (see [[graft.util.Deflate]] for the determinism contract). The
  * compressor call dominates, so codegen's win here is staying inside
  * the surrounding WholeStageCodegen span (no row materialization
  * boundary), not the loop body itself. */
case class DeflateLength(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_length"

  override def nullSafeEval(input: Any): Any =
    graft.util.Deflate.length(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.util.Deflate.length($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(newChild)
}

/** Compression ratio in ppm: `deflate_len · 10^6 div utf8_len`, NULL
  * for empty text — deflate and the exact integer division fused into
  * one expression so the ratio needs no post-hoc DIV plumbing and both
  * longs stay exact (Java long division of non-negatives IS floor). */
case class CompressionRatioPpm(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_compression_ratio_ppm"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    if (b.length == 0) null
    else Long.box(graft.util.Deflate.length(b) * 1000000L / b.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b")
      s"""
         |byte[] $b = $s.getBytes();
         |if ($b.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.util.Deflate.length($b) * 1000000L / $b.length;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CompressionRatioPpm =
    copy(newChild)
}

object TextExpressionFunctions {
  def deflateLength(text: Column): Column =
    ExpressionUtils.column(DeflateLength(ExpressionUtils.expression(text)))

  def compressionRatioPpm(text: Column): Column =
    ExpressionUtils.column(CompressionRatioPpm(ExpressionUtils.expression(text)))

  def rollingXxHash64(tokens: Column): Column =
    ExpressionUtils.column(RollingXxHash64(ExpressionUtils.expression(tokens)))

  /** Codegen'd Bloom-filter membership test over a LONG column — Spark's
    * own `BloomFilterMightContain` (the runtime-filter expression), fed a
    * pre-built serialized filter as a literal (exactly how
    * InjectRuntimeFilter pushes its filters; the 1% fpp bitset for 1M
    * keys is ~1.2 MB of plan literal). No UDF: the membership probe
    * stays inside WholeStageCodegen at the scan. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
        ExpressionUtils.expression(value)))

  def wordShingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(tokens), n))

  def tokenChunks(tokens: Column, size: Int, stride: Int): Column =
    ExpressionUtils.column(TokenChunks(
      ExpressionUtils.expression(tokens), size, stride))

  def languageId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(LanguageIdExpr(
      ExpressionUtils.expression(text), profiles))

  def tokenStats(text: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(TokenStats(
      ExpressionUtils.expression(text), stopwords))
}
