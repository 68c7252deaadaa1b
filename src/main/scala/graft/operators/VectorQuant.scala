package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Int8 embedding quantization — the storage/IO half of ANN at scale.
  *
  * A 100 TB float32 embedding corpus quantized symmetrically to int8 is
  * 25 TB on disk and in shuffle; cosine similarity is scale-invariant, so
  * candidate scoring runs directly on the int8 arrays (cast back to double
  * feeds the same codegen'd [[graft.expressions.GraftFunctions.cosine]]
  * loop) with no dequantization pass. Per-vector symmetric scaling
  * (q_i = floor(x_i·127/max|x| + 0.5)) keeps the quantizer a pure
  * scan-side projection — no corpus statistics, no training, so the same
  * code path serves batch indexing and incremental appends.
  */
object VectorQuant {

  /** Driver-side scalar twin of the `Int8Quantize` expression (same
    * formula, same double ops — bit-identical), for quantizing single
    * query vectors outside a plan. Returned as doubles so the result
    * feeds cosine literals directly. */
  def quantizeVec(v: Seq[Double]): Seq[Double] = {
    val m = v.foldLeft(0.0)((acc, x) => math.max(acc, math.abs(x)))
    if (m == 0) v.map(_ => 0.0)
    else v.map(x => math.floor(x * 127.0 / m + 0.5))
  }

  /** Quantized corpus: (idCol, q8 array<tinyint>, scale double). `scale`
    * is the dequantization factor (x ≈ q·scale); both columns are fused
    * codegen projections over the scan. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.select(col(idCol), GraftFunctions.quantizeInt8(vd).as("q8"),
      (GraftFunctions.maxAbs(vd) / 127.0d).as("scale"))
  }

  /** Brute-force cosine top-k over the QUANTIZED corpus (the shape of
    * [[Similarity.bruteForceTopK]], reading 1/4 the bytes): broadcast the
    * query row, score where the int8 vectors live, TakeOrderedAndProject. */
  def topK(quantized: DataFrame, idCol: String, queryId: Long,
      k: Int): DataFrame = {
    val q = quantized.filter(col(idCol) === queryId)
      .select(col("q8").cast("array<double>").as("__qvec"))
    quantized.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        GraftFunctions.cosine(col("q8").cast("array<double>"),
          col("__qvec")).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
