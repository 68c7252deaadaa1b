// Hosted under org.apache.spark.sql because AbstractDataType (the
// ExpectsInputTypes contract) and the Column<->Expression bridge
// (classic.ExpressionUtils) are private[sql]; the public API surface is
// graft.expressions.GraftFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector-similarity hot path.
  *
  * The built-in route (`zip_with` + `aggregate` higher-order functions)
  * evaluates its lambdas interpreted, per element, with boxing; these
  * expressions emit a tight primitive loop inside WholeStageCodegen — the
  * preference ladder's "custom Expression with doGenCode" rung
  * (SURVEY.md §7.1). Inputs are implicitly cast (array<float> →
  * array<double>); vectors are compared over the common prefix length and
  * null elements are treated as 0.
  */
abstract class VectorFoldExpression extends BinaryExpression
    with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
}

/** cosine(a, b) = dot(a,b) / (|a| * |b|), one fused loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    // zero-norm (or empty) vectors: define similarity as 0.0 rather than
    // NaN — Spark sorts NaN above every double, so a NaN row would rank
    // first in every descending top-k.
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(newLeft, newRight)
}

/** dot(a, b) — plain inner product, same codegen shape. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

/** All `bands` sign-LSH band buckets of a vector in ONE pass: bucket b's
  * bit h is sign(dot(vec, plane[b*planesPerBand+h])), the exact per-plane
  * formula of Similarity.lshBucket. Returns array<long> of length `bands`.
  *
  * Exists because composing the per-plane form into a 64-plane banded
  * projection inlines 64 dot-product expressions (× the optimizer's
  * explode size-guard duplicating the array into Filter and FileScan):
  * the generated method blows past HotSpot's JIT size limit and the whole
  * scan runs as interpreted bytecode (~100× — measured 3 s for 2 000 rows
  * at sf0.1). Here the plane matrix rides along as one flat double[] in
  * the codegen references and the work is a single JIT-friendly loop. */
case class SignLshBandBuckets(child: Expression, planes: IndexedSeq[Double],
    bands: Int, planesPerBand: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  // planes is an IndexedSeq, NOT an Array: case-class equality on arrays
  // is reference-based, which would make two identically-built
  // expressions never semanticEquals — defeating subexpression
  // elimination and exchange reuse for every consumer. The flat double[]
  // the hot loops index is derived lazily.
  require(planes.length == bands * planesPerBand * dim,
    s"plane matrix is ${planes.length} doubles, want bands*planesPerBand*dim")

  @transient private lazy val planeArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_band_buckets"
  // the default case-class toString would dump the full plane matrix
  // into every explain/plan string
  override def toString: String =
    s"graft_lsh_band_buckets($child, bands=$bands, planesPerBand=$planesPerBand, dim=$dim)"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var h = 0
      while (h < planesPerBand) {
        val off = (b * planesPerBand + h) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getDouble(i) * planeArr(off + i); i += 1 }
        if (dot > 0) bucket |= (1L << h)
        h += 1
      }
      out(b) = bucket
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bucket = 0L;
         |  for (int $h = 0; $h < $planesPerBand; $h++) {
         |    int $off = ($b * $planesPerBand + $h) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $v.getDouble($i) * $planesRef[$off + $i];
         |    }
         |    if ($dot > 0) $bucket |= (1L << $h);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBandBuckets =
    copy(child = newChild)
}

/** L2-normalize an array<double> in ONE fused pass: norm accumulation
  * then element scaling, inside WholeStageCodegen. The `transform`-HOF
  * formulation evaluates its lambda interpreted per element (the trap
  * every hot path here avoids); this is a plain JIT-friendly loop.
  * Division (not reciprocal multiplication) so the per-element rounding
  * is bit-identical to an engine that computes x / sqrt(dot(v,v)) — the
  * oracle contract. Zero/empty vectors pass through unchanged. */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i); ss += d * d; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    if (norm > 0) while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
    else while (i < n) { out(i) = x.getDouble(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = $v.getDouble($i); $ss += d * d;
         |}
         |double $norm = java.lang.Math.sqrt($ss);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $norm > 0 ? $v.getDouble($i) / $norm : $v.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** max(|x_i|) of an array<float|double> column — the symmetric-quantization
  * scale numerator, one fused loop (empty array → 0.0). */
case class ArrayMaxAbs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_maxabs"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(x.getDouble(i)); if (d > m) m = d; i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = java.lang.Math.abs($v.getDouble($i));
         |  if (d > $m) $m = d;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayMaxAbs =
    copy(child = newChild)
}

/** Symmetric per-vector int8 quantization: q_i = floor(x_i·127/m + 0.5)
  * with m = max(|x_i|) (zero vector → all zeros) — 4× the bytes of a
  * float corpus, 8× a double one, the standard embedding-store compression
  * at 100 TB. Cosine is scale-invariant, so similarity search over the
  * quantized corpus needs no dequantization (cast back to double feeds
  * [[CosineSimilarity]] directly); the dequantization scale, when needed,
  * is `ArrayMaxAbs(v)/127`. `floor(x+0.5)` — not HALF_EVEN/HALF_UP
  * `round` — is the rounding contract because both engines' floor is
  * exact on doubles (the cross-engine rule the repo's float-export
  * contracts use). Output range is exactly [-127, 127]: |x_i·127/m| ≤ 127
  * and floor(±127 + 0.5) stays at ±127, so -128 is never produced. */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(x.getDouble(i)); if (d > m) m = d; i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getDouble(i) * 127.0 / m + 0.5).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = java.lang.Math.abs($v.getDouble($i));
         |  if (d > $m) $m = d;
         |}
         |byte[] $out = new byte[$n];
         |if ($m > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor(
         |      $v.getDouble($i) * 127.0 / $m + 0.5);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** [[Int8Quantize]] emitting a dense BINARY value (one byte per element)
  * instead of array<tinyint>: parquet physically stores TINYINT array
  * elements as INT32, so the array form compresses essentially nothing on
  * incompressible embedding data (measured ~1:1 vs float) — the binary
  * form is the real 4× on-disk/IO win and is the storage type the
  * quantized ANN index uses. */
case class Int8QuantizeBinary(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize_int8_binary"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(x.getDouble(i)); if (d > m) m = d; i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getDouble(i) * 127.0 / m + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = java.lang.Math.abs($v.getDouble($i));
         |  if (d > $m) $m = d;
         |}
         |byte[] $out = new byte[$n];
         |if ($m > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor(
         |      $v.getDouble($i) * 127.0 / $m + 0.5);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeBinary =
    copy(child = newChild)
}

/** Cosine over two BINARY int8 vectors ([[Int8QuantizeBinary]] values):
  * bytes are read as signed int8 and accumulated in double (exact — the
  * sums are small integers), same zero-norm → 0.0 guard as
  * [[CosineSimilarity]]. Scoring the quantized corpus never materializes
  * an array. */
case class CosineInt8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_int8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a[$i]; double yi = (double) $b[$i];
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineInt8 = copy(left = newLeft, right = newRight)
}

/** Nearest-centroid cell id over a flat centroid matrix, in ONE fused
  * codegen loop: argmin over d_i = ||c_i||² − 2·v·c_i (the ||v||² term
  * cancels in the argmin; per-cell norms folded on the driver), ties
  * toward the lower cell id — bit-compatible with the previous
  * `array_min(array(struct(lit(cc)-2·dot, i)…))` unrolled form, which
  * this replaces for one reason: the unrolled form embeds every
  * centroid as a LITERAL, so each k-means iteration (new centroids)
  * generates a brand-new many-KB codegen unit and pays a fresh Janino
  * compile — k×dim literal doubles per assignment, per iteration, per
  * fit. Here the matrix rides in the codegen references (the
  * [[SignLshBandBuckets]] discipline): the generated SOURCE is
  * identical across iterations and fits, so the codegen cache serves
  * every iteration after the first.
  *
  * `offset` scores the subvector v[offset, offset+subDim) against the
  * cells without materializing a slice — the PQ subspace form. */
case class NearestCellId(child: Expression, cells: IndexedSeq[Double],
    k: Int, subDim: Int, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  require(cells.length == k * subDim,
    s"centroid matrix is ${cells.length} doubles, want k*subDim")

  @transient private lazy val cellArr: Array[Double] = cells.toArray
  // ||c_i||² folded once, exactly like the unrolled form's lit(cc)
  @transient private lazy val ccArr: Array[Double] =
    Array.tabulate(k) { c =>
      var s = 0.0; var j = 0
      while (j < subDim) {
        val x = cellArr(c * subDim + j); s += x * x; j += 1
      }
      s
    }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"
  override def toString: String =
    s"graft_nearest_cell($child, k=$k, subDim=$subDim, offset=$offset)"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val jmax = math.max(0,
      math.min(subDim, x.numElements() - offset))
    var best = Double.NaN
    var bestC = 0
    var c = 0
    while (c < k) {
      var dot = 0.0
      var j = 0
      while (j < jmax) {
        dot += x.getDouble(offset + j) * cellArr(c * subDim + j); j += 1
      }
      val d = ccArr(c) - 2.0 * dot
      if (c == 0 || java.lang.Double.compare(d, best) < 0) {
        best = d; bestC = c
      }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("nearestCells", cellArr, "double[]")
    val ccRef = ctx.addReferenceObj("nearestCellNorms", ccArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val jmax = ctx.freshName("jmax")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      s"""
         |int $jmax = java.lang.Math.max(0,
         |  java.lang.Math.min($subDim, $v.numElements() - $offset));
         |double $best = Double.NaN;
         |int $bestC = 0;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $jmax; $j++) {
         |    $dot += $v.getDouble($offset + $j) * $cellsRef[$c * $subDim + $j];
         |  }
         |  double $d = $ccRef[$c] - 2.0 * $dot;
         |  if ($c == 0 || java.lang.Double.compare($d, $best) < 0) {
         |    $best = $d; $bestC = $c;
         |  }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellId =
    copy(child = newChild)
}

/** Column-level API + SQL registration for the custom expressions
  * (re-exported as graft.expressions.GraftFunctions). */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def lshBandBuckets(vec: Column, planes: Array[Double], bands: Int,
      planesPerBand: Int, dim: Int): Column =
    ExpressionUtils.column(SignLshBandBuckets(
      ExpressionUtils.expression(vec), planes.toIndexedSeq, bands,
      planesPerBand, dim))

  def l2Normalize(vec: Column): Column =
    ExpressionUtils.column(L2Normalize(ExpressionUtils.expression(vec)))

  def maxAbs(vec: Column): Column =
    ExpressionUtils.column(ArrayMaxAbs(ExpressionUtils.expression(vec)))

  def quantizeInt8(vec: Column): Column =
    ExpressionUtils.column(Int8Quantize(ExpressionUtils.expression(vec)))

  def quantizeInt8Binary(vec: Column): Column =
    ExpressionUtils.column(Int8QuantizeBinary(ExpressionUtils.expression(vec)))

  def cosineInt8(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineInt8(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def nearestCell(vec: Column, cells: Array[Double], k: Int, subDim: Int,
      offset: Int = 0): Column =
    ExpressionUtils.column(NearestCellId(
      ExpressionUtils.expression(vec), cells.toIndexedSeq, k, subDim,
      offset))

  /** Expose `graft_cosine` / `graft_dot` / `graft_shingles` /
    * `graft_rolling_xxhash64` (scalar) and `graft_version` (table-valued,
    * time travel) to the SQL surface. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_l2_normalize",
      exprs => L2Normalize(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_maxabs",
      exprs => ArrayMaxAbs(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_quantize_int8",
      exprs => Int8Quantize(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_quantize_int8_binary",
      exprs => Int8QuantizeBinary(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_cosine_int8",
      exprs => CosineInt8(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_rolling_xxhash64",
      exprs => RollingXxHash64(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_shingles",
      exprs => {
        // n must be a foldable int literal, e.g. graft_shingles(toks, 3)
        val n = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an int literal, got $other")
        }
        WordShingles(exprs(0), n)
      }, "built-in")
    registry.createOrReplaceTempFunction("graft_token_chunks",
      exprs => {
        // size and stride must be int literals
        def intLit(e: Expression, name: String): Int = e.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_token_chunks $name must be an int literal, got $other")
        }
        TokenChunks(exprs(0), intLit(exprs(1), "size"), intLit(exprs(2), "stride"))
      }, "built-in")
    registry.createOrReplaceTempFunction("graft_language_id",
      exprs => LanguageIdExpr(exprs(0),
        graft.functions.TextFunctions.langProfiles.sortBy(_._1)), "built-in")
    registry.createOrReplaceTempFunction("graft_token_stats",
      exprs => {
        // stopwords as an array<string> literal; omit for none
        val stop = exprs.drop(1).headOption.map { e =>
          e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(StringType).map(_.toString).toSeq
        }.getOrElse(Nil)
        TokenStats(exprs(0), stop)
      }, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_version", graft.pipeline.VersionedTable.tvfBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_history", graft.pipeline.VersionedTable.historyTvfBuilder,
      "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_changes", graft.pipeline.VersionedTable.changesTvfBuilder,
      "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_refs", graft.pipeline.VersionedTable.refsTvfBuilder,
      "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_branch_history",
      graft.pipeline.VersionedTable.branchHistoryTvfBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_files", graft.pipeline.VersionedTable.filesTvfBuilder,
      "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_partitions",
      graft.pipeline.VersionedTable.partitionsTvfBuilder, "built-in")
  }
}
