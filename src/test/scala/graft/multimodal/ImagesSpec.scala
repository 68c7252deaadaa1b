package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Goldens for the real-image path. The hash values here are HARD-CODED
  * (from one audited GenImageFixtures run), not recomputed — if the
  * decode or hash arithmetic drifts, this spec fails even though the
  * generated-literal oracle (which shares the code) would drift along. */
class ImagesSpec extends SparkSpec {

  private val dir = "src/test/resources/images"
  private def bytesOf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(dir, name))
  private def grayOf(name: String): Images.Gray =
    Images.decodeGray(bytesOf(name)).get

  test("decodeGray: real PNG decode with exact integer luma") {
    val g = grayOf("img_01.png")
    assert(g.width == 72 && g.height == 64)
    assert(g.luma.length == 72 * 64)
    assert(g.luma.forall(l => l >= 0 && l <= 255))
    // corrupt / empty payloads decode to None, never throw
    assert(Images.decodeGray(Array[Byte](1, 2, 3)).isEmpty)
    assert(Images.decodeGray(Array.empty[Byte]).isEmpty)
    assert(Images.decodeGray(null).isEmpty)
    // truncated-but-valid-header payloads hit the plugin readers' decode
    // path (known to throw RuntimeExceptions, not just IOException —
    // the catch must be NonFatal-wide): still None, never a crash
    val whole = bytesOf("img_01.png")
    for (cut <- Seq(8, 16, 33, whole.length / 2)) {
      assert(Images.decodeGray(whole.take(cut)).isEmpty,
        s"truncation at $cut must decode to None")
    }
  }

  test("dhash/ahash golden values (frozen from an audited run)") {
    assert(Images.dhash64(grayOf("img_01.png")) == 5382481762962282917L)
    assert(Images.ahash64(grayOf("img_01.png")) == 6675533110543072802L)
    assert(Images.dhash64(grayOf("img_02.png")) == -6036596605771404631L)
    assert(Images.dhash64(grayOf("img_15.png")) == -5848464120998012265L)
  }

  test("planted relationships: near-identical, re-encoded, brightness-shifted") {
    def d(n: String) = Images.dhash64(grayOf(n))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one blown-out cell: a genuinely near-identical (not equal) pair
    assert(ham(d("img_01.png"), d("img_13.png")) == 2)
    // same pixels, different PNG bytes: byte digests differ, hashes equal
    assert(!bytesOf("img_02.png").sameElements(bytesOf("img_14.png")))
    assert(d("img_02.png") == d("img_14.png"))
    // uniform +5 brightness: dHash invariant (row-local differences)
    assert(d("img_15.png") == d("img_16.png"))
    // distinct patterns stay far apart
    assert(ham(d("img_03.png"), d("img_04.png")) > 10)
  }

  test("perceptual hashes are resolution-invariant for cell-aligned content") {
    // the same 9x8 cell pattern rendered at 1x and 2x resolution must
    // hash identically — the integer area-average downscale sees the
    // same cell means, so dHash/aHash depend on content, not pixel count
    def gray(cellW: Int, cellH: Int): Images.Gray = {
      val w = 9 * cellW; val h = 8 * cellH
      val luma = Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        ((x / cellW) * 31 + (y / cellH) * 97) % 256
      }
      Images.Gray(w, h, luma)
    }
    assert(Images.dhash64(gray(4, 4)) == Images.dhash64(gray(8, 8)))
    assert(Images.ahash64(gray(8, 8)) == Images.ahash64(gray(16, 16)))
    assert(Images.dhash64(gray(4, 4)) != 0L)
  }

  test("resizeGray: exact resizePlan dims, PNG round-trip, content survives") {
    val g = grayOf("img_01.png") // 72x64
    val r = Images.resizeGray(g, 24)
    // resizePlan formula: scale = 24/72, round(72/3)=24, round(64/3)=21
    assert(r.width == 24 && r.height == 21)
    // no upscale: maxDim above both dims is the identity
    assert(Images.resizeGray(g, 100) eq g)
    // the thumbnail PNG is lossless: decode returns the same integers
    val back = Images.decodeGray(Images.encodeGrayPng(r)).get
    assert(back.width == r.width && back.height == r.height)
    assert(back.luma.sameElements(r.luma))
    // cell-aligned fixture content: resized perceptual hash stays close
    // to the original's (both read the same 9x8 cell means)
    val ham = java.lang.Long.bitCount(Images.dhash64(r) ^ Images.dhash64(g))
    assert(ham <= 6, s"resize destroyed perceptual content: hamming $ham")
  }

  test("grayFeatures: exact integer stats on a hand-computed plane") {
    // 3x2 plane: rows (0, 16, 255), (32, 32, 48)
    val g = Images.Gray(3, 2, Array(0, 16, 255, 32, 32, 48))
    val f = Images.grayFeatures(g)
    assert(f.n_px == 6L)
    assert(f.luma_sum == 0 + 16 + 255 + 32 + 32 + 48)
    // bins: 0->0, 16->1, 255->15, 32->2, 32->2, 48->3
    val expectHist = Array.fill(16)(0L)
    expectHist(0) = 1; expectHist(1) = 1; expectHist(15) = 1
    expectHist(2) = 2; expectHist(3) = 1
    assert(f.hist.sameElements(expectHist))
    // gradients: |16-0|+|255-16| + |32-32|+|48-32| = 16+239+0+16
    assert(f.grad_sum == 271L)
  }

  test("hashImages: distributed decode matches local, drops undecodable rows") {
    import spark.implicits._
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".png")).sortBy(_.getName)
    val rows = files.map { f =>
      val id = "(\\d+)".r.findAllIn(f.getName).toSeq.last.toLong
      (id, Files.readAllBytes(f.toPath))
    }.toSeq :+ ((99L, Array[Byte](9, 9, 9))) // planted corrupt row
    val out = Images.hashImages(rows.toDF("image_id", "content"),
      "image_id", "content")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3)))
      .toMap
    assert(!got.contains(99L), "corrupt row must be dropped, not fail")
    assert(got.size == files.length)
    assert(got(1L) == ((72, 64, 5382481762962282917L)))
    assert(got(16L)._3 == Images.dhash64(grayOf("img_16.png")))
  }

  test("readImageDir: binaryFile source, id parse, byte-exact content") {
    val df = Images.readImageDir(spark, dir)
    assert(df.count() == 16)
    val row = df.filter(col("image_id") === 2L).collect().head
    assert(row.getAs[Array[Byte]]("content")
      .sameElements(bytesOf("img_02.png")))
    assert(row.getAs[Long]("n_bytes") == bytesOf("img_02.png").length)
  }

  test("dedupByContent collapses the planted clusters to min-id keepers") {
    val hashes = Images.hashImages(Images.readImageDir(spark, dir),
      "image_id", "content").localCheckpoint()
    val kept = Images.dedupByContent(hashes)
      .select("image_id").collect().map(_.getLong(0)).toSet
    // losers 13 (near-identical of 1), 14 (re-encode of 2), 16 (+5
    // brightness of 15) drop; everything else survives
    assert(kept == (1L to 16L).toSet -- Set(13L, 14L, 16L))
  }

  test("cellPatternPng: real encode/decode round-trip, resolution-invariant dhash") {
    val a = Images.decodeGray(Images.cellPatternPng(7L, 36, 32)).get
    val b = Images.decodeGray(Images.cellPatternPng(7L, 72, 64)).get
    val c = Images.decodeGray(Images.cellPatternPng(8L, 36, 32)).get
    // same pattern at 2x size: same cells, same hash (the property the
    // image_e2e bench's planted duplicates rely on)
    assert(Images.dhash64(a) == Images.dhash64(b))
    assert(Images.dhash64(a) != Images.dhash64(c))
  }

  test("hashIngestOnce: stream equals batch; re-drain decodes only new files") {
    val root = Files.createTempDirectory("graft_img_stream_").toString
    val src = s"$root/src"
    Files.createDirectories(Paths.get(src))
    Seq("img_01.png", "img_02.png").foreach(n =>
      Files.copy(Paths.get(dir, n), Paths.get(src, n)))
    Images.hashIngestOnce(spark, src, s"$root/out", s"$root/ckpt")
    def outRows = spark.read.parquet(s"$root/out")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val batch = Images.hashImages(Images.readImageDir(spark, src),
      "image_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(outRows == batch) // stream == batch on the same files
    // second drain with one new file: only it is appended (checkpointed
    // file-source progress — processed images never re-decode)
    Files.copy(Paths.get(dir, "img_03.png"), Paths.get(src, "img_03.png"))
    Images.hashIngestOnce(spark, src, s"$root/out", s"$root/ckpt")
    val after = outRows
    assert(after.keySet == Set(1L, 2L, 3L))
    assert(after(3L) == Images.dhash64(grayOf("img_03.png")))
    assert(spark.read.parquet(s"$root/out").count() == 3) // no reprocess
  }

  test("cleanImageCorpus: corrupt drops, flat filtered, near-dups collapse") {
    import spark.implicits._
    val flat = Images.encodeGrayPng(
      Images.Gray(36, 32, Array.fill(36 * 32)(128))) // zero gradient
    val rows = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".png")).sortBy(_.getName).map { f =>
        val id = "(\\d+)".r.findAllIn(f.getName).toSeq.last.toLong
        (id, Files.readAllBytes(f.toPath))
      }.toSeq ++ Seq(
        (90L, flat),                  // informative-filter victim
        (99L, Array[Byte](1, 2, 3))) // corrupt: dropped at decode
    val report = Images.cleanImageCorpus(rows.toDF("image_id", "content"),
      "image_id", "content")
    val counts = report.stages.toMap
    assert(counts("input") == 18)
    assert(counts("decoded") == 17)      // corrupt row gone
    assert(counts("edge_filter") == 16)  // flat image gone
    assert(counts("content_dedup") == 13) // 3 planted dups collapse
    assert(report.cleaned.select("image_id").collect().map(_.getLong(0))
      .toSet == (1L to 16L).toSet -- Set(13L, 14L, 16L))
  }

  test("video near-dup: trimmed and reordered copies found, disjoint not") {
    import spark.implicits._
    def video(vid: Long, patterns: Seq[Long]): Seq[(Long, Long, Array[Byte])] =
      patterns.zipWithIndex.map { case (p, f) =>
        (vid, f.toLong, Images.cellPatternPng(p, 36, 32))
      }
    val frames = (
      video(1L, Seq(1, 2, 3, 4, 5)) ++
      video(2L, Seq(2, 3, 4, 5)) ++       // trimmed: J = 4/5
      video(3L, Seq(5, 4, 3, 2, 1)) ++    // reordered: same SET, J = 1
      video(4L, Seq(10, 11, 12, 13, 14))  // disjoint
    ).toDF("video_id", "frame_idx", "content")
    val pairs = Images.videoNearDupPairs(frames, "video_id", "frame_idx",
        "content", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(pairs == Set((1L, 2L, 0.8), (1L, 3L, 1.0), (2L, 3L, 0.8)))
    // fingerprints: the ordered sequence separates the reordered copy,
    // the set-based join above deliberately does not
    val fp = Images.videoFingerprints(frames, "video_id", "frame_idx",
        "content")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fp(1L) != fp(3L)) // same set, different order -> digests differ
    assert(fp.values.toSet.size == 4)
  }

  test("nearDupPairs: banded join equals brute force (pigeonhole exactness)") {
    val hashes = Images.hashImages(Images.readImageDir(spark, dir),
      "image_id", "content").localCheckpoint()
    val got = Images.nearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected hash list
    val hs = hashes.select("image_id", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = (for {
      (ia, da) <- hs; (ib, db) <- hs if ia < ib
      d = java.lang.Long.bitCount(da ^ db) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    // exactly the three planted pairs
    assert(got == Set((1L, 13L, 2), (2L, 14L, 0), (15L, 16L, 0)))
  }
}
