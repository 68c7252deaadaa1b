package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{Audio, Images, Multimodal}
import graft.operators.ParseFixedWidth
import graft.pipeline.IncrementalAgg
import graft.streaming.IncrementalIngest

/** Query entries for the multimodal plumbing and the streaming-shaped
  * (event-time windowed) aggregation. The windowed agg runs the exact plan
  * the streaming path uses — in batch mode the watermark is a no-op, so the
  * DuckDB oracle can check it. */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Media table stats: schema + metadata plumbing over binary payloads. */
  def q34MediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.fromDocuments(t(s, dir, "documents")).select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).as("n_bytes"),
      col("meta.width_px").as("width_px"),
      col("meta.duration_ms").as("duration_ms"))

  /** Video frame sampling: one row per sampled frame timestamp. */
  def q35FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
      Multimodal.fromDocuments(t(s, dir, "documents")), everyMs = 10000L)

  /** Aspect-preserving resize plan (metadata compute for a resize kernel). */
  def q36ResizePlan(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
      Multimodal.fromDocuments(t(s, dir, "documents")), maxDim = 512)

  /** Batch-wise stub decode + feature extraction. Features are exported as
    * an integer-scaled joined string (x128): every stub-decode term is a
    * multiple of 1/128 and per-bucket sums stay far below 2^17, so the
    * float32 accumulation is exact and DuckDB reproduces it bit-for-bit. */
  def q37ExtractFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.fromDocuments(t(s, dir, "documents")),
      new Multimodal.StubDecoder(8))
      .select(col("media_id"), col("kind"),
        array_join(transform(col("features"),
          f => round(f * 128).cast("long").cast("string")), ",")
          .as("features_x128"))

  /** Checked-in NOAA-format fixtures for the fixed-width dimension path
    * (the reference's largest job,
    * glue-jobs/noaa_dimensions_bronze_to_silver.py:39-213). Input is a raw
    * text file, not the sf parquet tables. Resolution: env override, else
    * the repo-relative path resolved against the working directory
    * (walking up so test/Verify runs from a subdirectory still find it) —
    * no hardcoded checkout location. The resolved ABSOLUTE path is what
    * the generated oracle SQL embeds, because the driver's DuckDB run has
    * its own cwd. */
  private def resolveFixture(rel: String): String = {
    val cwd = new java.io.File(".").getCanonicalFile
    Iterator.iterate(cwd)(_.getParentFile).takeWhile(_ != null)
      .map(d => new java.io.File(d, rel))
      .find(_.exists())
      .getOrElse(new java.io.File(cwd, rel))
      .getAbsolutePath
  }
  private val fixtureDir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
    resolveFixture("src/test/resources/noaa"))
  private val stationsFixture = s"$fixtureDir/ghcnd-stations.txt"
  private val inventoryFixture = s"$fixtureDir/ghcnd-inventory.txt"
  private val jsonlFixture = sys.env.getOrElse("SPARK_GRAFT_JSONL_FIXTURE",
    resolveFixture("src/test/resources/jsonl/docs.jsonl"))
  private val imagesFixtureDir = sys.env.getOrElse("SPARK_GRAFT_IMAGES_DIR",
    resolveFixture("src/test/resources/images"))

  /** Fixed-offset stations dimension parse (S2/F7/F8 + flag booleans). */
  def q66ParseStations(s: SparkSession, dir: String): DataFrame =
    ParseFixedWidth.parseStations(s.read.text(stationsFixture))

  /** Whitespace-split inventory parse (S2/F9 + casts). */
  def q67ParseInventory(s: SparkSession, dir: String): DataFrame =
    ParseFixedWidth.parseInventory(s.read.text(inventoryFixture))

  /** JSONL corpus ingestion: explicit schema, valid rows, typed derived
    * measures (the LLM-corpus interchange format as a first-class
    * source). */
  def q72JsonlDocs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Jsonl.valid(s, jsonlFixture, graft.sources.Jsonl.docsSchema)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("n_chars"),
        size(split(col("text"), "\\s+")).as("n_tokens"))

  /** Real image decode (JDK ImageIO) + integer perceptual hashes over the
    * checked-in PNG fixtures, read through the binaryFile source. The
    * oracle replays driver-side decoded literals; ImagesSpec pins the
    * same values as hard-coded goldens, so the two sides cannot drift
    * together unnoticed. */
  def q122ImageHash(s: SparkSession, dir: String): DataFrame =
    Images.hashImages(Images.readImageDir(s, imagesFixtureDir),
      "image_id", "content")

  /** Perceptual image near-dup: banded Hamming self-join over the dHash.
    * maxHamming=3 < bands=4 makes banding EXACT by pigeonhole, so the
    * DuckDB oracle is a brute-force O(n²) self-join over the decoded
    * hash literals — a structurally independent check of the banded
    * candidate path (a missed candidate pair fails the hash compare). */
  def q123ImageNearDup(s: SparkSession, dir: String): DataFrame =
    Images.nearDupPairs(q122ImageHash(s, dir))

  /** Real resize (integer area-average to ≤ 24px) with the perceptual
    * hash of the resized content; target dims are exactly q36's
    * resizePlan formula, now executed on pixels. */
  def q127ImageResize(s: SparkSession, dir: String): DataFrame =
    Images.resizeImages(Images.readImageDir(s, imagesFixtureDir),
        "image_id", "content", maxDim = 24)
      .drop("thumb_png") // encoder bytes are JVM-specific; dims+hash export

  /** Real image content features (exact integers: pixel count, luma sum,
    * 16-bin histogram, horizontal gradient energy). */
  def q128ImageFeatures(s: SparkSession, dir: String): DataFrame =
    Images.extractImageFeatures(Images.readImageDir(s, imagesFixtureDir),
        "image_id", "content")
      .select(col("image_id"), col("n_px"), col("luma_sum"),
        array_join(col("hist"), ",").as("hist"), col("grad_sum"))

  /** Video near-dup over constructed frame streams: 20 videos × 5 real
    * PNG frames where video v and v+10 render the SAME frame patterns —
    * so the result is data-independent given the construction (the q73
    * discipline): exactly the ten (v, v+10) pairs at jaccard 1.0, which
    * a literal oracle pins while the engine still runs the full decode →
    * hash → guarded inverted-index join. */
  def q129VideoNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vids = Tables.load(s, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") < 20).as[Long]
    val frames = vids.flatMap { v =>
      (0L until 5L).map { f =>
        (v, f, Images.cellPatternPng((v % 10) * 5 + f, 36, 32))
      }
    }.toDF("video_id", "frame_idx", "content")
    Images.videoNearDupPairs(frames, "video_id", "frame_idx", "content",
        threshold = 0.7)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Audio envelope fingerprints over constructed PCM: 100 clips where
    * clip v and v+50 share the loudness contour. Hash literals are
    * driver-decoded (AudioSpec pins hand-computed envelopes). */
  private def audioClips(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") < 100).as[Long]
      .map(v => (v, Audio.patternPcm(v % 50, 1300)))
      .toDF("audio_id", "content")
  }

  def q130AudioHash(s: SparkSession, dir: String): DataFrame =
    Audio.hashAudio(audioClips(s, dir), "audio_id", "content")

  /** Audio near-dup: construction-pinned (q73/q129 discipline) — exactly
    * the fifty (v, v+50) pairs at hamming 0. */
  def q131AudioNearDup(s: SparkSession, dir: String): DataFrame =
    Audio.nearDupPairs(
      Audio.hashAudio(audioClips(s, dir), "audio_id", "content"))

  /** Composed image-corpus cleaning under the oracle gate: 100
    * constructed images — ids 95+ are flat (edge-filter victims), the
    * rest render pattern id%40 — so the cleaned set is data-independent
    * given the construction: exactly the min-id keeper of each of the
    * 40 pattern clusters, ids 0..39. */
  def q132ImagePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flat = Images.encodeGrayPng(
      Images.Gray(36, 32, Array.fill(36 * 32)(128)))
    val imgs = Tables.load(s, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") < 100).as[Long]
      .map { id =>
        val bytes =
          if (id >= 95) flat
          else Images.cellPatternPng(id % 40, 36, 32)
        (id, bytes)
      }.toDF("image_id", "content")
    Images.cleanImageCorpus(imgs, "image_id", "content",
        collectStats = false)
      .cleaned.select("image_id", "width_px", "height_px")
  }

  /** Driver-side decode of the PNG fixtures for the image oracles: same
    * integer-arithmetic hash code as the Spark path (goldens in
    * ImagesSpec break the circularity). */
  private lazy val imageFixtureRows: Seq[(Long, Int, Int, Long, Long)] =
    new java.io.File(imagesFixtureDir).listFiles()
      .filter(_.getName.endsWith(".png")).sortBy(_.getName).toSeq
      .map { f =>
        val id = "(\\d+)".r.findAllIn(f.getName).toSeq.last.toLong
        val g = Images.decodeGray(
          java.nio.file.Files.readAllBytes(f.toPath)).getOrElse(
          sys.error(s"fixture ${f.getName} failed to decode"))
        (id, g.width, g.height, Images.dhash64(g), Images.ahash64(g))
      }

  private lazy val imageFixtureGrays: Seq[(Long, Images.Gray)] =
    new java.io.File(imagesFixtureDir).listFiles()
      .filter(_.getName.endsWith(".png")).sortBy(_.getName).toSeq
      .map { f =>
        val id = "(\\d+)".r.findAllIn(f.getName).toSeq.last.toLong
        id -> Images.decodeGray(
          java.nio.file.Files.readAllBytes(f.toPath)).getOrElse(
          sys.error(s"fixture ${f.getName} failed to decode"))
      }

  private def imageOracles: Map[String, String] = {
    val values = imageFixtureRows.map { case (id, w, h, d, a) =>
      s"($id, $w, $h, CAST($d AS BIGINT), CAST($a AS BIGINT))"
    }.mkString(",\n  ")
    val resizeValues = imageFixtureGrays.map { case (id, g) =>
      val r = Images.resizeGray(g, 24)
      s"($id, ${g.width}, ${g.height}, ${r.width}, ${r.height}, " +
        s"CAST(${Images.dhash64(r)} AS BIGINT))"
    }.mkString(",\n  ")
    val featValues = imageFixtureGrays.map { case (id, g) =>
      val f = Images.grayFeatures(g)
      s"($id, ${f.n_px}, ${f.luma_sum}, '${f.hist.mkString(",")}', " +
        s"${f.grad_sum})"
    }.mkString(",\n  ")
    Map(
      "q127_image_resize" ->
        s"""SELECT CAST(image_id AS BIGINT) AS image_id,
           | CAST(width_px AS INTEGER) AS width_px,
           | CAST(height_px AS INTEGER) AS height_px,
           | CAST(target_width_px AS INTEGER) AS target_width_px,
           | CAST(target_height_px AS INTEGER) AS target_height_px,
           | resized_dhash
           |FROM (VALUES
           |  $resizeValues) AS t(image_id, width_px, height_px,
           |  target_width_px, target_height_px, resized_dhash)""".stripMargin,
      "q128_image_features" ->
        s"""SELECT CAST(image_id AS BIGINT) AS image_id,
           | CAST(n_px AS BIGINT) AS n_px,
           | CAST(luma_sum AS BIGINT) AS luma_sum, hist,
           | CAST(grad_sum AS BIGINT) AS grad_sum
           |FROM (VALUES
           |  $featValues) AS t(image_id, n_px, luma_sum, hist, grad_sum)""".stripMargin,
      "q132_image_pipeline" ->
        // construction-pinned: min-id keeper per pattern cluster
        s"""SELECT CAST(image_id AS BIGINT) AS image_id,
           | CAST(36 AS INTEGER) AS width_px,
           | CAST(32 AS INTEGER) AS height_px
           |FROM (VALUES
           |  ${(0 until 40).map(v => s"($v)").mkString(",\n  ")})
           |  AS t(image_id)""".stripMargin,
      "q130_audio_hash" -> {
        val vals = (0L until 100L).map { v =>
          val samples = Audio.pcm16(Audio.patternPcm(v % 50, 1300))
          s"($v, ${samples.length}, " +
            s"CAST(${Audio.envelopeHash64(samples)} AS BIGINT))"
        }.mkString(",\n  ")
        s"""SELECT CAST(audio_id AS BIGINT) AS audio_id,
           | CAST(n_samples AS BIGINT) AS n_samples, envhash
           |FROM (VALUES
           |  $vals) AS t(audio_id, n_samples, envhash)""".stripMargin
      },
      "q131_audio_neardup" ->
        // construction-pinned: v and v+50 share the contour exactly
        s"""SELECT CAST(id_a AS BIGINT) AS id_a,
           | CAST(id_b AS BIGINT) AS id_b,
           | CAST(hamming AS INTEGER) AS hamming
           |FROM (VALUES
           |  ${(0 until 50).map(v => s"($v, ${v + 50}, 0)").mkString(",\n  ")})
           |  AS t(id_a, id_b, hamming)""".stripMargin,
      "q129_video_neardup" ->
        // construction-pinned (q73 discipline): videos v and v+10 share
        // ALL five frame patterns, every other pair shares none
        s"""SELECT CAST(id_a AS BIGINT) AS id_a,
           | CAST(id_b AS BIGINT) AS id_b,
           | CAST(jaccard AS DOUBLE) AS jaccard
           |FROM (VALUES
           |  ${(0 until 10).map(v => s"($v, ${v + 10}, 1.0)").mkString(",\n  ")})
           |  AS t(id_a, id_b, jaccard)""".stripMargin,
      "q122_image_hash" ->
        s"""SELECT CAST(image_id AS BIGINT) AS image_id,
           | CAST(width_px AS INTEGER) AS width_px,
           | CAST(height_px AS INTEGER) AS height_px, dhash, ahash
           |FROM (VALUES
           |  $values) AS t(image_id, width_px, height_px, dhash, ahash)""".stripMargin,
      "q123_image_neardup" ->
        s"""WITH h AS (
           |  SELECT CAST(image_id AS BIGINT) AS image_id, dhash
           |  FROM (VALUES
           |  $values) AS t(image_id, width_px, height_px, dhash, ahash)
           |)
           |SELECT a.image_id AS id_a, b.image_id AS id_b,
           |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
           |FROM h a JOIN h b ON a.image_id < b.image_id
           |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin)
  }

  /** Event-time windowed aggregation (streaming plan in batch mode).
    * Window bounds exported as epoch seconds to keep the comparison
    * timezone-free. */
  def q38WindowedAgg(s: SparkSession, dir: String): DataFrame =
    IncrementalIngest.windowedCounts(t(s, dir, "events"), "ts", "event_type",
        windowDuration = "1 hour")
      .select(col("window_start").cast("long").as("ws"),
        col("event_type"), col("n"), col("total_value"))

  /** Incremental gold refresh proven equivalent to a full recompute: the
    * standing aggregate (days 1-19) merged with the new increment's
    * aggregate (days 20+) must hash-match the oracle's one-shot full
    * GROUP BY — the recompute-equivalence contract that makes O(day)
    * daily maintenance safe. Counts merge as sums; the decimal total
    * merges exactly; min/max are order-insensitive. */
  def q94IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def aggOf(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val gold = aggOf(e.filter(dayofmonth(col("ts")) < 20))
    val inc = aggOf(e.filter(dayofmonth(col("ts")) >= 20))
    IncrementalAgg.merge(gold, inc, keys = Seq("event_type"),
        sums = Seq("n", "total"), mins = Seq("vmin"), maxs = Seq("vmax"))
      .select(col("event_type"), col("n"),
        col("total").cast("double").as("total"), col("vmin"), col("vmax"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_media_stats" -> (q34MediaStats _),
    "q35_frame_sample" -> (q35FrameSample _),
    "q36_resize_plan" -> (q36ResizePlan _),
    "q37_extract_features" -> (q37ExtractFeatures _),
    "q38_windowed_agg" -> (q38WindowedAgg _),
    "q66_parse_stations" -> (q66ParseStations _),
    "q67_parse_inventory" -> (q67ParseInventory _),
    "q72_jsonl_docs" -> (q72JsonlDocs _),
    "q94_incremental_agg" -> (q94IncrementalAgg _),
    "q122_image_hash" -> (q122ImageHash _),
    "q123_image_neardup" -> (q123ImageNearDup _),
    "q127_image_resize" -> (q127ImageResize _),
    "q128_image_features" -> (q128ImageFeatures _),
    "q129_video_neardup" -> (q129VideoNearDup _),
    "q130_audio_hash" -> (q130AudioHash _),
    "q131_audio_neardup" -> (q131AudioNearDup _),
    "q132_image_pipeline" -> (q132ImagePipeline _))

  lazy val oracles: Map[String, String] = imageOracles ++ Map(
    "q94_incremental_agg" ->
      // full one-shot recompute — the incremental merge must equal it
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | MIN(value) AS vmin, MAX(value) AS vmax
        |FROM events GROUP BY event_type""".stripMargin,
    "q34_media_stats" ->
      """SELECT doc_id AS media_id,
        | (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST((doc_id % 8) * 160 + 320 AS INTEGER) AS width_px,
        | (doc_id % 60) * 1000 + 5000 AS duration_ms
        |FROM documents""".stripMargin,
    "q35_frame_sample" ->
      """SELECT doc_id AS media_id, unnest(generate_series(0, (doc_id % 60) * 1000 + 5000, 10000)) AS frame_ts_ms
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    "q36_resize_plan" ->
      """SELECT doc_id AS media_id,
        | (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
        | CAST((doc_id % 8) * 160 + 320 AS INTEGER) AS width_px,
        | CAST((doc_id % 8) * 90 + 180 AS INTEGER) AS height_px,
        | CAST(greatest(1, round(((doc_id % 8) * 160 + 320) * least(1.0, 512.0 / greatest((doc_id % 8) * 160 + 320, (doc_id % 8) * 90 + 180)))) AS INTEGER) AS target_width_px,
        | CAST(greatest(1, round(((doc_id % 8) * 90 + 180) * least(1.0, 512.0 / greatest((doc_id % 8) * 160 + 320, (doc_id % 8) * 90 + 180)))) AS INTEGER) AS target_height_px
        |FROM documents""".stripMargin,
    "q37_extract_features" ->
      """SELECT doc_id AS media_id,
        | (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
        | array_to_string(
        |   [coalesce(list_sum([ascii(text[i+1]) for i in generate_series(0, length(text)-1) if i % 8 = j]), 0)
        |    for j in generate_series(0, 7)], ',') AS features_x128
        |FROM documents""".stripMargin,
    "q38_windowed_agg" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS ws,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q66_parse_stations" ->
      s"""WITH lines AS (
         |  SELECT unnest(string_split(content, chr(10))) AS value
         |  FROM read_text('$stationsFixture')
         |), f AS (
         |  SELECT
         |    trim(substr(value, 1, 11)) AS station_id,
         |    CAST(nullif(trim(substr(value, 13, 8)), '') AS DOUBLE) AS latitude,
         |    CAST(nullif(trim(substr(value, 22, 9)), '') AS DOUBLE) AS longitude,
         |    CAST(nullif(trim(substr(value, 32, 6)), '') AS DOUBLE) AS elevation,
         |    trim(substr(value, 39, 2)) AS state,
         |    trim(substr(value, 42, 30)) AS station_name,
         |    trim(substr(value, 73, 3)) AS gsn_flag,
         |    trim(substr(value, 77, 3)) AS hcn_crn_flag,
         |    trim(substr(value, 81, 5)) AS wmo_id
         |  FROM lines
         |)
         |SELECT f.*, gsn_flag = 'GSN' AS is_gsn,
         |  hcn_crn_flag IN ('HCN', 'CRN') AS is_hcn_crn
         |FROM f WHERE station_id <> ''""".stripMargin,
    "q72_jsonl_docs" ->
      s"""SELECT doc_id, lang,
         |  CAST(length(text) AS INTEGER) AS n_chars,
         |  CAST(len(regexp_split_to_array(text, '\\s+')) AS INTEGER) AS n_tokens
         |FROM read_ndjson('$jsonlFixture',
         |  columns = {doc_id: 'BIGINT', lang: 'VARCHAR', text: 'VARCHAR'})""".stripMargin,
    "q67_parse_inventory" ->
      s"""WITH toks AS (
         |  SELECT regexp_split_to_array(trim(value), '\\s+') AS t
         |  FROM (SELECT unnest(string_split(content, chr(10))) AS value
         |        FROM read_text('$inventoryFixture'))
         |)
         |SELECT t[1] AS station_id,
         |  CAST(t[2] AS DOUBLE) AS latitude,
         |  CAST(t[3] AS DOUBLE) AS longitude,
         |  t[4] AS element,
         |  CAST(t[5] AS INTEGER) AS first_year,
         |  CAST(t[6] AS INTEGER) AS last_year
         |FROM toks WHERE t[1] IS NOT NULL AND t[1] <> ''""".stripMargin)
}
