package graft.multimodal

import graft.util.Ckpt.CkptOps
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Real image decode + perceptual hashing — the content-level half of the
  * multimodal pillar ([[Multimodal]] holds the schema/batching plumbing).
  *
  * Decode is JDK `javax.imageio` (PNG/JPEG/BMP/GIF — lossless formats
  * decode bit-exactly on every JVM, no native codec needed). Everything
  * derived from the pixels is INTEGER arithmetic end to end — luma via the
  * exact (299r+587g+114b)/1000 rational, grid cells via integer area
  * averages — so a fixture's dHash is one deterministic 64-bit value that
  * a literal-valued DuckDB oracle can replay, and the near-dup join over
  * those hashes is checkable against a brute-force SQL self-join.
  *
  * Scale shape: decoding runs inside the existing typed `mapPartitions`
  * boundary (plan-internal, column-pruned below, codegen resumes above;
  * see [[Multimodal.extractFeatures]]), emitting an 8-byte hash per image
  * — so the near-dup join over a billion images shuffles longs, never
  * pixels. The Hamming join itself is [[NearDup.hammingPairs]]: banded
  * candidates with the oversized-bucket star guard, exact for
  * maxHamming < bands by pigeonhole.
  */
object Images {

  /** Decoded grayscale plane: row-major integer luma in 0..255. */
  final case class Gray(width: Int, height: Int, luma: Array[Int])

  /** Decode any ImageIO-supported payload to integer luma. Returns None
    * for undecodable/empty payloads (corrupt rows must not kill a 100 TB
    * scan — callers surface them as null hashes and filter). */
  def decodeGray(payload: Array[Byte]): Option[Gray] = {
    if (payload == null || payload.isEmpty) return None
    // NonFatal, not just IOException: ImageIO plugin readers throw
    // RuntimeExceptions (ArrayIndexOutOfBounds, NegativeArraySize,
    // CMMException...) on truncated/malformed payloads, and one
    // adversarial blob must not kill a 100 TB scan
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val luma = new Array[Int](w * h)
    // single-band (grayscale) images: read the 8-bit samples directly —
    // Java's gray<->sRGB colorspace conversion in getRGB applies a gamma
    // transform and would corrupt a lossless gray round-trip
    val grayDirect = img.getRaster.getNumBands == 1 &&
      img.getRaster.getSampleModel.getSampleSize(0) == 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        luma(y * w + x) =
          if (grayDirect) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            // exact integer Rec.601 luma — no float rounding anywhere
            (299 * r + 587 * g + 114 * b) / 1000
          }
        x += 1
      }
      y += 1
    }
    Some(Gray(w, h, luma))
  }

  /** `gw` x `gh` grid of integer area-average luma: cell (i,j) averages
    * the pixel block [floor(i·w/gw), floor((i+1)·w/gw)) ×
    * [floor(j·h/gh), floor((j+1)·h/gh)) with an exact integer sum/count
    * division — the deterministic downscale under the perceptual hashes
    * (a Graphics2D resize would be renderer-dependent). */
  private[multimodal] def gridLuma(g: Gray, gw: Int, gh: Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var j = 0
    while (j < gh) {
      val y0 = j * g.height / gh
      val y1 = math.max((j + 1) * g.height / gh, y0 + 1)
      var i = 0
      while (i < gw) {
        val x0 = i * g.width / gw
        val x1 = math.max((i + 1) * g.width / gw, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, g.height)) {
          var x = x0
          while (x < math.min(x1, g.width)) {
            sum += g.luma(y * g.width + x)
            x += 1
          }
          y += 1
        }
        val n = (math.min(y1, g.height) - y0).toLong *
          (math.min(x1, g.width) - x0)
        out(j * gw + i) = (sum / math.max(n, 1L)).toInt
        i += 1
      }
      j += 1
    }
    out
  }

  /** 64-bit difference hash: 9×8 grid, bit (j·8+i) set when cell (i,j) is
    * strictly darker than its right neighbour. Row-local differences make
    * it invariant to uniform brightness shifts and robust to re-encoding
    * (lossless re-compressions hash identically — the perceptual-dedup
    * property exact byte digests lack). */
  def dhash64(g: Gray): Long = {
    val grid = gridLuma(g, 9, 8)
    var bitsOut = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (grid(j * 9 + i) < grid(j * 9 + i + 1)) {
          bitsOut |= 1L << (j * 8 + i)
        }
        i += 1
      }
      j += 1
    }
    bitsOut
  }

  /** 64-bit average hash: 8×8 grid, bit set when the cell exceeds the
    * integer mean of all 64 cells. Complements [[dhash64]] (global
    * structure vs local gradients). */
  def ahash64(g: Gray): Long = {
    val grid = gridLuma(g, 8, 8)
    var sum = 0L
    var k = 0
    while (k < 64) { sum += grid(k); k += 1 }
    val mean = sum / 64
    var bitsOut = 0L
    k = 0
    while (k < 64) {
      if (grid(k) > mean) bitsOut |= 1L << k
      k += 1
    }
    bitsOut
  }

  /** Real aspect-preserving resize of the luma plane: target dims are
    * EXACTLY [[Multimodal.resizePlan]]'s formula (scale = min(1,
    * maxDim/max(w,h)), HALF_UP rounding), pixels via the same integer
    * area-average as the perceptual hashes — deterministic on every JVM,
    * no Graphics2D renderer in the loop. Upscaling never happens
    * (scale caps at 1). */
  def resizeGray(g: Gray, maxDim: Int): Gray = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val scale = math.min(1.0, maxDim.toDouble / math.max(g.width, g.height))
    val tw = math.max(1, math.round(g.width * scale).toInt)
    val th = math.max(1, math.round(g.height * scale).toInt)
    if (tw == g.width && th == g.height) g
    else Gray(tw, th, gridLuma(g, tw, th))
  }

  /** Re-encode a luma plane as a grayscale PNG (lossless — decodes back
    * to the same integers). The thumbnail-materialization half of the
    * resize path; bytes are JVM-encoder-dependent, so queries export
    * dims/hashes, not payloads. */
  def encodeGrayPng(g: Gray): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(g.width, g.height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // write samples through the raster — setRGB would push the value
    // through the sRGB->gray colorspace transform (not value-preserving)
    var y = 0
    while (y < g.height) {
      var x = 0
      while (x < g.width) {
        img.getRaster.setSample(x, y, 0, g.luma(y * g.width + x))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Exact-integer content features of a luma plane: pixel count, luma
    * sum (mean = sum/n at the caller's precision), a 16-bin histogram
    * (bin = luma/16), and the total horizontal gradient (Σ|l(x+1,y) −
    * l(x,y)| — an edge-energy proxy). Every value is an exact integer,
    * so a literal-valued oracle replays them bit-for-bit. */
  final case class GrayFeatures(n_px: Long, luma_sum: Long,
      hist: Array[Long], grad_sum: Long)

  def grayFeatures(g: Gray): GrayFeatures = {
    val hist = new Array[Long](16)
    var sum = 0L
    var grad = 0L
    var y = 0
    while (y < g.height) {
      var x = 0
      while (x < g.width) {
        val l = g.luma(y * g.width + x)
        sum += l
        hist(math.min(l / 16, 15)) += 1
        if (x + 1 < g.width) {
          grad += math.abs(g.luma(y * g.width + x + 1) - l)
        }
        x += 1
      }
      y += 1
    }
    GrayFeatures(g.width.toLong * g.height, sum, hist, grad)
  }

  final case class ImageIn(image_id: Long, content: Array[Byte])
  final case class ImageHash(image_id: Long, width_px: Int, height_px: Int,
      dhash: Long, ahash: Long)
  final case class ImageResized(image_id: Long, width_px: Int,
      height_px: Int, target_width_px: Int, target_height_px: Int,
      resized_dhash: Long, thumb_png: Array[Byte])
  final case class ImageFeats(image_id: Long, n_px: Long, luma_sum: Long,
      hist: Array[Long], grad_sum: Long)

  // object-level Encoders so the typed decode boundary derives them once
  // (no SparkSession implicits needed at the call sites)
  import org.apache.spark.sql.{Encoder, Encoders}
  private implicit val imageInEnc: Encoder[ImageIn] =
    Encoders.product[ImageIn]
  private implicit val imageHashEnc: Encoder[ImageHash] =
    Encoders.product[ImageHash]
  private implicit val imageResizedEnc: Encoder[ImageResized] =
    Encoders.product[ImageResized]
  private implicit val imageFeatsEnc: Encoder[ImageFeats] =
    Encoders.product[ImageFeats]

  /** Shared decode boundary: typed `mapPartitions` in `batchSize` groups
    * (decode stays a plan node — column pruning below, codegen resumes
    * above; a real codec amortizes setup per batch), undecodable
    * payloads dropped. Every image operator maps one function over the
    * decoded (id, Gray) stream. */
  private def mapDecoded[T: org.apache.spark.sql.Encoder](df: DataFrame,
      idCol: String, bytesCol: String, batchSize: Int)(
      f: (Long, Gray) => T): org.apache.spark.sql.Dataset[T] =
    df.select(col(idCol).cast("long").as("image_id"),
        col(bytesCol).as("content")).as[ImageIn]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            decodeGray(m.content).map(g => f(m.image_id, g))
          }
        }
      }

  /** Decode + hash a binary image column: (image_id, width_px, height_px,
    * dhash, ahash). */
  def hashImages(df: DataFrame, idCol: String, bytesCol: String,
      batchSize: Int = 64): DataFrame =
    mapDecoded(df, idCol, bytesCol, batchSize) { (id, g) =>
      ImageHash(id, g.width, g.height, dhash64(g), ahash64(g))
    }.toDF()

  /** Real resize: decode → integer area-average downscale to ≤ maxDim →
    * perceptual hash of the RESIZED content + a materialized grayscale
    * PNG thumbnail. Same typed mapPartitions shape as [[hashImages]];
    * undecodable payloads drop. The target dims reproduce
    * [[Multimodal.resizePlan]]'s metadata computation exactly — plan and
    * execution cannot disagree. */
  def resizeImages(df: DataFrame, idCol: String, bytesCol: String,
      maxDim: Int, batchSize: Int = 64): DataFrame =
    mapDecoded(df, idCol, bytesCol, batchSize) { (id, g) =>
      val r = resizeGray(g, maxDim)
      ImageResized(id, g.width, g.height, r.width, r.height,
        dhash64(r), encodeGrayPng(r))
    }.toDF()

  /** Real content features per image (exact integers — see
    * [[grayFeatures]]). The real-decode replacement for
    * [[Multimodal.extractFeatures]]'s stub on the image kind. */
  def extractImageFeatures(df: DataFrame, idCol: String, bytesCol: String,
      batchSize: Int = 64): DataFrame =
    mapDecoded(df, idCol, bytesCol, batchSize) { (id, g) =>
      val f = grayFeatures(g)
      ImageFeats(id, f.n_px, f.luma_sum, f.hist, f.grad_sum)
    }.toDF()

  /** Read a directory of image files via the binaryFile source (the
    * idiomatic Spark image-ingest path: distributed file listing, column
    * pruning on length/path without touching content). image_id parses
    * from the trailing integer in the file name (img_7.png → 7). */
  def readImageDir(spark: SparkSession, dir: String,
      glob: String = "*.png"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z]+$", 1)
          .cast("long").as("image_id"),
        col("length").as("n_bytes"),
        col("content"))

  /** Streaming twin of [[readImageDir]]: the binaryFile source with the
    * explicit schema streaming requires. [[hashImages]] composes
    * unchanged on top — the typed decode boundary is a streaming-safe
    * plan node, so a continuous image crawl hashes in-flight. */
  def readImageStream(spark: SparkSession, dir: String,
      glob: String = "*.png"): DataFrame = {
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z]+$", 1)
          .cast("long").as("image_id"),
        col("length").as("n_bytes"),
        col("content"))
  }

  /** Exactly-once streaming image ingest: drain whatever files are new
    * in `srcDir` (AvailableNow), decode + hash them, append to
    * `destDir`. File-source progress lives in the checkpoint, so a
    * re-drain never re-decodes processed images — the continuous-crawl
    * shape where hashing cost tracks NEW images, not corpus size. */
  def hashIngestOnce(spark: SparkSession, srcDir: String, destDir: String,
      checkpointDir: String, glob: String = "*.png"): Unit = {
    val q = hashImages(readImageStream(spark, srcDir, glob),
        "image_id", "content")
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Perceptual near-dup pairs over hashed images: banded Hamming join on
    * the dHash. With the default maxHamming=3 < bands=4 the result is
    * EXACT (pigeonhole — see [[NearDup.hammingPairs]]), which is what
    * lets a brute-force DuckDB self-join oracle the whole path. Output:
    * id_a < id_b, hamming. */
  def nearDupPairs(hashes: DataFrame, idCol: String = "image_id",
      hashCol: String = "dhash", maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    NearDup.hammingPairs(hashes, idCol, hashCol, bands = 4,
      maxHamming = maxHamming, maxBucketSize = maxBucketSize)

  /** Perceptual content dedup: one representative (min id) per near-dup
    * cluster — the C4 exact-dedup stage for images, where the "content
    * key" is the dHash instead of a byte digest, so re-encoded and
    * slightly-perturbed copies collapse too. Pairs come from the guarded
    * banded join; clusters from the same union-find machinery as
    * document dedup (shuffles 8-byte hashes and ids, never pixels). */
  def dedupByContent(hashes: DataFrame, idCol: String = "image_id",
      hashCol: String = "dhash", maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    graft.operators.Components.keepClusterRepresentatives(hashes, idCol,
      nearDupPairs(hashes, idCol, hashCol, maxHamming, maxBucketSize))

  final case class FrameIn(video_id: Long, frame_idx: Long,
      content: Array[Byte])
  final case class FrameHash(video_id: Long, frame_idx: Long, dhash: Long)
  private implicit val frameInEnc: Encoder[FrameIn] =
    Encoders.product[FrameIn]
  private implicit val frameHashEnc: Encoder[FrameHash] =
    Encoders.product[FrameHash]

  /** Per-frame perceptual hashes of a video frame stream
    * (video_id, frame_idx, content) — the video content key: a video IS
    * its ordered frame-hash sequence. Same decode boundary as
    * [[hashImages]]; undecodable frames drop. */
  def hashFrames(frames: DataFrame, videoIdCol: String,
      frameIdxCol: String, bytesCol: String,
      batchSize: Int = 64): DataFrame =
    frames.select(col(videoIdCol).cast("long").as("video_id"),
        col(frameIdxCol).cast("long").as("frame_idx"),
        col(bytesCol).as("content")).as[FrameIn]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            decodeGray(m.content).map(g =>
              FrameHash(m.video_id, m.frame_idx, dhash64(g)))
          }
        }
      }.toDF()

  /** Per-video fingerprint: the ordered frame-hash array plus one 64-bit
    * exact-dup digest over it (same-content videos collide; any frame
    * difference separates). One partial-aggregated pass; the shuffle
    * carries 8 bytes per frame, never pixels. */
  def videoFingerprints(frames: DataFrame, videoIdCol: String,
      frameIdxCol: String, bytesCol: String): DataFrame =
    hashFrames(frames, videoIdCol, frameIdxCol, bytesCol)
      .groupBy(col("video_id"))
      .agg(transform(
          array_sort(collect_list(struct(col("frame_idx"), col("dhash")))),
          s => s.getField("dhash")).as("frame_hashes"))
      .select(col("video_id"), col("frame_hashes"),
        xxhash64(concat_ws(",", col("frame_hashes"))).as("video_digest"))

  /** Video near-dup: exact Jaccard over each video's SET of frame
    * hashes, through the same guarded inverted-index join as n-gram text
    * Jaccard ([[NearDup.jaccardPairsOverTokens]]) — trimmed, reordered,
    * or re-encoded copies stay similar because their frames hash the
    * same; `maxDocFreq` drops intro/outro boilerplate frames shared by
    * everything, exactly like ubiquitous shingles. Output: id_a < id_b,
    * jaccard >= threshold. */
  def videoNearDupPairs(frames: DataFrame, videoIdCol: String,
      frameIdxCol: String, bytesCol: String, threshold: Double = 0.5,
      maxDocFreq: Long = 1000): DataFrame =
    NearDup.jaccardPairsOverTokens(
      hashFrames(frames, videoIdCol, frameIdxCol, bytesCol)
        .select(col("video_id"), col("dhash").as("sh")),
      "video_id", threshold, maxDocFreq,
      // frame-hash sets are tiny and postings cheap — the exchange pin
      // is a pure fan-out tax here (see jaccardPairsOverTokens)
      pinParallelism = false)

  final case class CleanReport(stages: Seq[(String, Long)],
      cleaned: DataFrame)

  /** Composed image-corpus cleaning — DocPipeline's shape for images:
    * decode+hash (undecodable rows drop at the boundary) → information
    * filter (mean horizontal gradient per pixel below `minEdgePerPx`
    * flags flat/near-constant images, the blur/blank heuristic) →
    * perceptual content dedup. Everything after the decode shuffles
    * 8-byte hashes and small stats, never pixels; the hash table is
    * checkpointed once for the filter, the pair join, and the final
    * keep. */
  def cleanImageCorpus(df: DataFrame, idCol: String, bytesCol: String,
      minEdgePerPx: Double = 1.0, maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      collectStats: Boolean = true): CleanReport = {
    val stages = Seq.newBuilder[(String, Long)]
    def stat(name: String, d: DataFrame): Unit =
      if (collectStats) stages += name -> d.count()
    stat("input", df)
    implicit val rowEnc: Encoder[(Long, Int, Int, Long, Long, Long)] =
      Encoders.product[(Long, Int, Int, Long, Long, Long)]
    val scored = mapDecoded(df, idCol, bytesCol, 64) { (id, g) =>
      val f = grayFeatures(g)
      (id, g.width, g.height, dhash64(g), f.grad_sum, f.n_px)
    }.toDF("image_id", "width_px", "height_px", "dhash", "grad_sum",
        "n_px")
      .ckpt()
    stat("decoded", scored)
    val informative = scored.filter(
      col("grad_sum") >= col("n_px") * lit(minEdgePerPx))
    stat("edge_filter", informative)
    val kept = dedupByContent(informative, "image_id", "dhash",
      maxHamming, maxBucketSize)
    stat("content_dedup", kept)
    CleanReport(stages.result(),
      kept.select(col("image_id"), col("width_px"), col("height_px"),
        col("dhash")))
  }

  /** Deterministic cell-pattern grayscale PNG: 9×8 constant cells from an
    * integer mix of (patternId, cell) — REAL encoded bytes for synthetic
    * image corpora (fixtures, specs, and the image_e2e bench generate
    * with this, then exercise the real decode path on the result). Two
    * calls with the same patternId at the same size are near-dup by
    * construction (identical cells ⇒ identical dHash). */
  def cellPatternPng(patternId: Long, w: Int, h: Int): Array[Byte] = {
    val luma = Array.tabulate(w * h) { k =>
      val x = k % w
      val y = k / w
      var v = (patternId * 1000003L + (x * 9 / w) * 7919L +
        (y * 8 / h) * 104729L + 0x9e3779b9L).toInt
      v ^= v >>> 15; v *= 0x85ebca6b
      v ^= v >>> 13; v *= 0xc2b2ae35
      v ^= v >>> 16
      v & 0xff
    }
    encodeGrayPng(Gray(w, h, luma))
  }
}
