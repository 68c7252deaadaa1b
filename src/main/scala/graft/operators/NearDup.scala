package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection: MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: the naive near-dup join is O(n²). Both LSH families here
  * reduce it to (1) a per-row signature projection (no shuffle), (2) a
  * shuffle on (band, band_hash) — i.e. on a few bytes per row, never the
  * document — and (3) an equi self-join within buckets, which Catalyst
  * executes as a shuffled hash join on the bucket key. Only candidate pairs
  * (a tiny fraction of n²) are verified with exact Jaccard.
  */
object NearDup {

  /** Word n-gram shingles of a token array (n=1 → token set). */
  def shingles(toks: Column, n: Int): Column =
    if (n <= 1) toks
    else transform(sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))

  /** MinHash signature: k independent permutations approximated by seeded
    * xxhash64; element j = min hash of any shingle under seed j. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }: _*)

  /** doc_id, band, band_hash — one row per LSH band. Docs agreeing on all
    * `rowsPerBand` signature slots of any band land in the same bucket.
    * numHashes = bands * rowsPerBand. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sig = df.select(col(idCol),
      minhashSignature(shingles(TextFunctions.tokens(col(textCol)), shingleSize), k)
        .as("sig"))
    sig.select(col(idCol), posexplode(
        array((0 until bands).map { b =>
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
              .cast("array<string>")))
        }: _*)).as(Seq("band", "band_hash")))
  }

  /** Candidate pairs from shared LSH buckets, verified with exact Jaccard
    * over distinct shingle sets; keeps pairs with jaccard >= threshold.
    * Output: id_a < id_b, jaccard. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val b = minhashBands(df, idCol, textCol, shingleSize, bands, rowsPerBand)
    val candidates = b.as("a")
      .join(b.as("b"), Seq("band", "band_hash"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sets = df.select(col(idCol),
      array_distinct(shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("sh"))
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of (+1/-1 according to bit i of the token's hash). Near-dups
    * differ in few bits (small Hamming distance). Pure expression — one
    * projection, no shuffle. */
  def simhash64(toks: Column): Column = {
    val hashed = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      val votes = aggregate(hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidates: bucket by `bands` slices of the simhash
    * (docs equal on any slice are candidates), verify by Hamming distance
    * <= maxHamming. Output: id_a < id_b, hamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 8): DataFrame = {
    val bits = 64 / bands
    val sigs = df.select(col(idCol),
      simhash64(TextFunctions.tokens(col(textCol))).as("sig"))
    val banded = sigs.select(col(idCol), col("sig"), posexplode(
      array((0 until bands).map { b =>
        shiftrightunsigned(col("sig"), b * bits)
          .bitwiseAND(lit((1L << bits) - 1))
      }: _*)).as(Seq("band", "band_val")))
    val hamming = {
      val x = col("a.sig").bitwiseXOR(col("b.sig"))
      bit_count(x)
    }
    banded.as("a").join(banded.as("b"), Seq("band", "band_val"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join (no LSH): meet candidate docs in
    * an inverted-index join on the shingle — avoids the n² cross join
    * because only docs sharing at least one indexable shingle ever meet.
    *
    * `maxDocFreq` is the scale guard: shingles present in more than that
    * many documents are dropped from the *index* (their posting lists would
    * dominate the join quadratically, and a shingle shared by everything
    * carries no near-dup signal). Jaccard itself is then computed exactly
    * over the full shingle sets of each surviving candidate pair, so the
    * guard only bounds recall for pairs whose overlap is exclusively
    * ultra-common shingles. Output: id_a < id_b, jaccard >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Long = 1000): DataFrame = {
    val sets = df.select(col(idCol),
      array_distinct(shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("sh"))
    val inverted = sets.select(col(idCol), explode(col("sh")).as("shingle"))
    val rare = inverted.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("shingle")
    val indexed = inverted.join(rare, Seq("shingle"), "left_semi")
    val candidates = indexed.as("a").join(indexed.as("b"), Seq("shingle"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
