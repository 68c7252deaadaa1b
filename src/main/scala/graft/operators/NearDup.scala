package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection: MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: the naive near-dup join is O(n²). Both LSH families here
  * reduce it to (1) signature construction as an explode + codegen'd hash
  * aggregation (higher-order-function lambdas are interpreted in Spark, so
  * per-seed `transform` passes over shingle arrays are deliberately
  * avoided), (2) a shuffle on (band, band_hash) — a few bytes per row,
  * never the document — and (3) an equi self-join within buckets. Candidate
  * pairs are verified with exact Jaccard computed by *counting* shared
  * shingles through the inverted index, so no shingle arrays are ever
  * shuffled or joined.
  */
object NearDup {

  /** Word n-gram shingles of a token array (n=1 → token set). Column form,
    * for composing inside other expressions; corpus-scale paths use
    * [[shingleRows]] instead (HOF lambdas evaluate interpreted).
    * Shorter-than-n arrays yield an empty array — without the guard,
    * `sequence(0, size-n)` would count DOWN for them (the same degenerate
    * descending-sequence edge RangeJoin clamps) and emit garbage
    * shingles. */
  def shingles(toks: Column, n: Int): Column =
    if (n <= 1) toks
    else when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** (id, shingle) rows, built scan-side: the codegen'd WordShingles
    * expression assembles every n-gram inside the row's projection, so the
    * explode emits finished shingles with NO exchange — downstream per-doc
    * aggregations see explode-local rows and partial-combine map-side.
    * (The previous formulation assembled n-grams from window `lead`s over
    * (id, pos), which hash-shuffled and sorted every shingle row first.) */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val tok = TextFunctions.tokens(col(textCol))
    val sh = if (n <= 1) tok
      else graft.expressions.GraftFunctions.wordShingles(tok, n)
    df.select(col(idCol), explode(sh).as("shingle"))
  }

  /** (id, sh) rows — distinct shingle *hashes* per doc (set semantics).
    * Shingles are hashed to longs immediately after the explode: all
    * downstream joins/aggregations key on 8-byte longs instead of n-gram
    * strings, and set-dedup happens in a codegen'd hash aggregate (the
    * per-row `array_distinct` would be interpreted O(len²) string compares).
    * Duplicate rows are co-located at explode time, so partial aggregation
    * dedups map-side before any shuffle. */
  private def explodedShingles(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    shingleRows(df, idCol, textCol, shingleSize)
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))
      .distinct()

  /** MinHash signature per document: k seeded xxhash64 minima, built with a
    * single explode + hash-aggregate (map-side partial min → the shuffle
    * carries k longs per doc, and everything stays in codegen). Each
    * shingle STRING is hashed once; the k seeded values are derived from
    * that 8-byte hash (`xxhash64(seed, xxhash64(shingle))`) — an equally
    * valid minhash family that replaces k string walks per shingle
    * occurrence with one, and shares its base hash with the verify
    * index. Documents with fewer tokens than the shingle size produce no
    * shingles and are omitted. Output: (idCol, sig: array<long>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, k: Int): DataFrame =
    // No set-dedup needed: duplicates cannot change a minimum.
    shingleRows(df, idCol, textCol, shingleSize)
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))
      .groupBy(col(idCol))
      .agg(array((0 until k).map { seed =>
        min(xxhash64(lit(seed), col("sh")))
      }: _*).as("sig"))

  /** Per-band bucket hashes of a minhash signature column, as an array:
    * element b hashes the b-th `rowsPerBand` slice of the signature. */
  private def bandHashArray(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
    }: _*)

  /** doc_id, band, band_hash — one row per LSH band. Docs agreeing on all
    * `rowsPerBand` signature slots of any band land in the same bucket.
    * numHashes = bands * rowsPerBand. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashSignatures(df, idCol, textCol, shingleSize, bands * rowsPerBand)
      .select(col(idCol),
        posexplode(bandHashArray(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "band_hash")))

  /** Oversized-bucket guard for the banded (band, bucket) self-joins: a
    * cell of B near-identical docs — the realistic duplicate-heavy-crawl
    * case — would otherwise emit B²/2 candidate pairs into one reducer.
    * Restrict the LEFT side of the self-join to the cell's minimum id
    * whenever the cell exceeds `maxBucketSize`: the cell then contributes
    * a (representative, member) STAR — B−1 pairs that connect the whole
    * cell for downstream connected-components clustering — instead of the
    * full clique. Small cells are untouched (exact pair semantics).
    *
    * Cost: one extra aggregate keyed on the same (band, bucket) the
    * self-join shuffles on, so the ids exchange is still computed once and
    * reused by the aggregate and both join sides. The within-big-cell
    * pairs lost to the star remain connected through the representative
    * (transitively across bands: a pair suppressed here either met in an
    * earlier, smaller cell or both members pair with that cell's own
    * minimum), so cluster membership is preserved — only the explicit
    * pair list is thinned, which is the point. */
  private[operators] def capBucketSide(ids: DataFrame, idCol: String,
      bandCol: String, bucketCol: String, maxBucketSize: Int): DataFrame = {
    val stats = ids.groupBy(col(bandCol), col(bucketCol))
      .agg(count(lit(1)).as("__bn"), min(col(idCol)).as("__bmin"))
    ids.join(stats, Seq(bandCol, bucketCol))
      .filter(col("__bn") <= maxBucketSize || col(idCol) === col("__bmin"))
      .drop("__bn", "__bmin")
  }

  /** Exact Jaccard for candidate pairs, by counting shingles shared through
    * the inverted index (never joining the arrays themselves). `exploded`
    * must have distinct (id, shingle) rows. */
  private def verifyJaccard(candidates: DataFrame, exploded: DataFrame,
      idCol: String): DataFrame = {
    val sizes = exploded.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val common = candidates
      .join(exploded.select(col(idCol).as("id_a"), col("sh")), Seq("id_a"))
      .join(exploded.select(col(idCol).as("id_b"), col("sh")),
        Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** Candidate pairs from shared LSH buckets, verified with exact Jaccard
    * over distinct shingle sets; keeps pairs with jaccard >= threshold.
    * Each side of the band self-join carries its `bands`-long band-hash
    * array, so a pair colliding in several bands is kept only at its
    * FIRST agreeing band — a local codegen filter instead of a
    * `distinct()` exchange over the candidate set. Buckets larger than
    * `maxBucketSize` contribute a representative star, not a clique
    * (see [[capBucketSide]]).
    * Output: id_a < id_b, jaccard. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5, maxBucketSize: Int = 1000): DataFrame = {
    // The signature table feeds THREE consumers (both self-join sides +
    // the bucket-size stats); physical exchange reuse does not survive
    // the differing predicates each branch pushes down, so without the
    // checkpoint the scan→shingle→signature pipeline executes three
    // times (measured: the whole corpus tokenized 6× per run).
    // Materialize it once — k longs per doc, the cheapest thing in the
    // query to hold.
    val sigs = minhashSignatures(df, idCol, textCol, shingleSize,
      bands * rowsPerBand).localCheckpoint()
    val ids = sigs
      .select(col(idCol),
        bandHashArray(col("sig"), bands, rowsPerBand).as("__bhs"))
      .select(col(idCol), col("__bhs"),
        posexplode(col("__bhs")).as(Seq("band", "band_hash")))
    val capped = capBucketSide(ids, idCol, "band", "band_hash", maxBucketSize)
    val joined = capped.as("a").join(ids.as("b"), Seq("band", "band_hash"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
    val firstBandOnly = if (bands <= 1) joined else {
      val earlierBandAgrees = (0 until bands - 1).map { j =>
        col("band") > j &&
          col("a.__bhs").getItem(j) === col("b.__bhs").getItem(j)
      }.reduce(_ || _)
      joined.filter(!earlierBandAgrees)
    }
    val candidates = firstBandOnly
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    // Same story for the inverted index: three consumers (id_a side,
    // id_b side, per-doc sizes) — checkpoint the (id, shingle-hash) set
    // so the second tokenization pass is the last.
    verifyJaccard(candidates,
        explodedShingles(df, idCol, textCol, shingleSize).localCheckpoint(),
        idCol)
      .filter(col("jaccard") >= threshold)
  }

  /** [[minhashPairs]] as PURE SQL TEXT over a registered `documents` view
    * — the reference's Athena discipline (SQL-over-catalog is the
    * interactive surface) applied to the extension operators, the same
    * way q69 expresses the as-of join in SQL. Requires
    * `GraftFunctions.register` (for `graft_shingles`); everything else is
    * built-in SQL (`xxhash64`, `posexplode`). Semantically identical to
    * the DataFrame operator — same shingling, seeded minima, band
    * hashing, oversized-bucket star guard, first-agreeing-band dedup and
    * inverted-index Jaccard verify — and cross-checked equal in
    * SqlNearDupSpec. */
  def minhashPairsSql(shingleSize: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.5,
      maxBucketSize: Int = 1000, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val k = bands * rowsPerBand
    val mins = (0 until k)
      .map(s => s"min(xxhash64($s, sh)) AS h$s").mkString(",\n    ")
    val bandHashes = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand)
        .map(r => s"CAST(h${b * rowsPerBand + r} AS STRING)").mkString(", ")
      s"xxhash64(concat_ws(',', $slots))"
    }.mkString(",\n    ")
    val earlier =
      if (bands <= 1) "false"
      else (0 until bands - 1)
        .map(j => s"(a.band > $j AND a.bhs[$j] = b.bhs[$j])")
        .mkString(" OR ")
    s"""WITH raw AS (
       |  SELECT $idCol AS doc_id,
       |    explode(graft_shingles(split($textCol, '\\\\s+'), $shingleSize)) AS shingle
       |  FROM $table
       |), ex AS (
       |  SELECT doc_id, xxhash64(shingle) AS sh FROM raw
       |), sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM ex GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, array(
       |    $bandHashes) AS bhs
       |  FROM sig
       |), ids AS (
       |  SELECT doc_id, bhs, posexplode(bhs) AS (band, bh) FROM bands
       |), stats AS (
       |  SELECT band, bh, count(*) AS bn, min(doc_id) AS bmin
       |  FROM ids GROUP BY band, bh
       |), cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ids a
       |  JOIN stats s ON a.band = s.band AND a.bh = s.bh
       |  JOIN ids b ON a.band = b.band AND a.bh = b.bh
       |  WHERE a.doc_id < b.doc_id
       |    AND (s.bn <= $maxBucketSize OR a.doc_id = s.bmin)
       |    AND NOT ($earlier)
       |), exd AS (
       |  SELECT DISTINCT doc_id, sh FROM ex
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM exd GROUP BY doc_id
       |), common AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN exd ea ON ea.doc_id = c.id_a
       |  JOIN exd eb ON eb.doc_id = c.id_b AND eb.sh = ea.sh
       |  GROUP BY c.id_a, c.id_b
       |)
       |SELECT c.id_a, c.id_b,
       |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
       |FROM common c
       |JOIN sizes sa ON sa.doc_id = c.id_a
       |JOIN sizes sb ON sb.doc_id = c.id_b
       |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= $threshold""".stripMargin
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of (+1/-1 according to bit i of the token's hash). Near-dups
    * differ in few bits (small Hamming distance). Column form — prefer
    * [[simhashSignatures]] for corpus-scale use. */
  def simhash64(toks: Column): Column = {
    val hashed = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      val votes = aggregate(hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash per document via explode + codegen'd hash-aggregate: 64
    * per-bit vote sums in one aggregation pass (token multiplicity counts,
    * matching [[simhash64]]). Output: (idCol, sig: long). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col(idCol), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$i")
    }
    val votes = ex.groupBy(col(idCol)).agg(voteCols.head, voteCols.tail: _*)
    votes.select(col(idCol),
      (0 until 64).map { i =>
        when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
      }.reduce(_.bitwiseOR(_)).as("sig"))
  }

  /** SimHash near-dup candidates: bucket by `bands` slices of the simhash
    * (docs equal on any slice are candidates), verify by Hamming distance
    * <= maxHamming. A pair agreeing on several slices is emitted only at
    * its FIRST agreeing band — both sides carry the full signature, so
    * the earlier-band check is a local codegen filter and no `distinct()`
    * exchange is needed (same dedup as cosineNearDupPairs). Buckets larger
    * than `maxBucketSize` contribute a representative star, not a clique
    * (see [[capBucketSide]]).
    * Output: id_a < id_b, hamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    val bits = 64 / bands
    def slice(sig: Column, b: Int): Column =
      shiftrightunsigned(sig, b * bits).bitwiseAND(lit((1L << bits) - 1))
    // one long per doc, three consumers — same checkpoint rationale as
    // minhashPairs
    val sigs = simhashSignatures(df, idCol, textCol).localCheckpoint()
    val banded = sigs.select(col(idCol), col("sig"), posexplode(
      array((0 until bands).map(b => slice(col("sig"), b)): _*))
      .as(Seq("band", "band_val")))
    val capped = capBucketSide(banded, idCol, "band", "band_val", maxBucketSize)
    val joined = capped.as("a").join(banded.as("b"), Seq("band", "band_val"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
    val firstBandOnly = if (bands <= 1) joined else {
      val earlierBandAgrees = (0 until bands - 1).map { j =>
        col("band") > j && slice(col("a.sig"), j) === slice(col("b.sig"), j)
      }.reduce(_ || _)
      joined.filter(!earlierBandAgrees)
    }
    firstBandOnly
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join (no LSH): meet candidate docs in
    * an inverted-index join on the shingle — avoids the n² cross join
    * because only docs sharing at least one indexable shingle ever meet.
    *
    * `maxDocFreq` is the scale guard: shingles present in more than that
    * many documents are dropped from the *index* (their posting lists would
    * dominate the join quadratically, and a shingle shared by everything
    * carries no near-dup signal). Candidate generation and the common-count
    * both use the guarded index, so similarity is Jaccard over the indexed
    * shingle space — exact when nothing exceeds the guard, conservative
    * (never inflated) when something does.
    * Output: id_a < id_b, jaccard >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Long = 1000): DataFrame = {
    // Repartition on the shingle hash BEFORE the set-dedup: hash
    // partitioning by sh satisfies the (id, sh) grouping distribution, so
    // the distinct adds no exchange, and every consumer below (df-guard,
    // semi-join, self-join) keys on `sh` and reuses this single exchange —
    // the tokenize/shingle pipeline runs once, not 3×.
    val exploded = shingleRows(df, idCol, textCol, shingleSize)
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))
      .repartition(col("sh"))
      .distinct()
    val rare = exploded.groupBy("sh")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("sh")
    // `indexed` has three consumers (both co-occurrence sides + sizes);
    // checkpointing it makes the tokenize→shingle→distinct→df-guard
    // lineage run exactly once instead of per consumer.
    val indexed = exploded.join(rare, Seq("sh"), "left_semi")
      .localCheckpoint()
    // One pass: the co-occurrence join itself yields the common-shingle
    // count per pair (map-side partial count), so candidate pairs are never
    // materialized separately and the index is never re-joined.
    val common = indexed.as("a").join(indexed.as("b"), Seq("sh"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = indexed.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
