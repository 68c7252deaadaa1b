package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus batch-wise decode/feature-extraction.
  *
  * The Spark-side contracts here — schema, partitioning, batch shape — are
  * real and tested; the actual byte decode is stubbed behind [[Decoder]]
  * (no image/audio codecs in this environment) with a deterministic fake,
  * exactly where a JNI/codec call would slot in.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate_hz", IntegerType))))))

  /** Build a media table from the documents table: payload = utf-8 bytes of
    * the text (opaque stand-in for real media bytes), metadata derived
    * deterministically from doc_id. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width_px"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height_px"),
        (pmod(col("doc_id"), lit(60)) * 1000 + 5000).as("duration_ms"),
        lit(16000).as("sample_rate_hz")).as("meta"))

  /** Decode boundary. A production implementation wraps an image/audio
    * library (JNI or vectorized codec); this container has none, so the
    * stub derives a deterministic feature vector from the bytes — the
    * Spark-side plumbing (batching, schema, distribution) is identical. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], kind: String): Array[Float]
  }

  /** REAL decoder for image payloads (PNG/JPEG via [[Images.decodeGray]]):
    * features = [n_px, mean_luma, grad_per_kpx, hist_0..hist_15 shares] —
    * the exact-integer [[Images.grayFeatures]] stats as a fixed 19-dim
    * float vector. Non-image kinds and undecodable payloads yield the
    * zero vector (a pipeline can filter on features(0) == 0). This is
    * the [[Decoder]] trait's production instance; [[StubDecoder]] remains
    * for the kinds this container genuinely cannot decode (audio/video
    * codecs). */
  final class ImageIoDecoder extends Decoder {
    def decode(payload: Array[Byte], kind: String): Array[Float] = {
      val out = new Array[Float](19)
      if (kind == "image") {
        Images.decodeGray(payload).foreach { g =>
          val f = Images.grayFeatures(g)
          out(0) = f.n_px.toFloat
          out(1) = (f.luma_sum.toDouble / f.n_px).toFloat
          out(2) = (f.grad_sum * 1000.0 / f.n_px).toFloat
          var i = 0
          while (i < 16) {
            out(3 + i) = (f.hist(i).toDouble / f.n_px).toFloat
            i += 1
          }
        }
      }
      out
    }
  }

  /** Deterministic fake decode: dim float features folded from byte
    * content. Stands in for `???` (real codec) — see [[Decoder]]. */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    def decode(payload: Array[Byte], kind: String): Array[Float] = {
      val acc = new Array[Float](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          acc(i % dim) += payload(i).toInt / 128.0f
          i += 1
        }
      }
      acc
    }
  }

  /** Typed rows at the decode boundary (kept at object level so their
    * Encoders derive once). */
  final case class MediaIn(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
      features: Array[Float])

  /** Batch-wise feature extraction: processes each partition in batches of
    * `batchSize` rows (the JVM analogue of a Pandas-UDF `mapInPandas`
    * iterator-of-batches contract — a real decoder amortizes model/codec
    * setup per batch, not per row). Output: media_id, kind, features.
    *
    * Implemented as typed `Dataset.mapPartitions`, not `df.rdd`: the
    * decode stays a node INSIDE the query plan (DeserializeToObject →
    * MapPartitions → SerializeFromObject), so column pruning still reaches
    * the scan below it and codegen stages resume above it — an RDD
    * round-trip would cut the plan in two and re-apply the schema. */
  def extractFeatures(df: DataFrame, decoder: Decoder,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("kind"), col("payload")).as[MediaIn]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (codec init, model load)
          batch.iterator.map { m =>
            MediaFeatures(m.media_id, m.kind, decoder.decode(m.payload, m.kind))
          }
        }
      }.toDF()
  }

  /** Video frame sampling plumbing: one row per sampled frame timestamp
    * (every `everyMs` ms across meta.duration_ms). Pure expression —
    * explode(sequence(...)), no UDF. */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
          .as("frame_ts_ms"))

  /** Metadata-level resize: aspect-preserving target dimensions bounded by
    * `maxDim` (the compute a resize UDF would read per row). */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width_px")
    val h = col("meta.height_px")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    df.select(col("media_id"), col("kind"), w.as("width_px"), h.as("height_px"),
      // greatest(1, ...): same sub-pixel clamp as Images.resizeGray, so a
      // degenerate aspect ratio (1×100 at maxDim 24) plans the dimension
      // execution actually produces — plan and execution cannot disagree
      greatest(lit(1), round(w * scale).cast("int"))
        .as("target_width_px"),
      greatest(lit(1), round(h * scale).cast("int"))
        .as("target_height_px"))
  }
}
