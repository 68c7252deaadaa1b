package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Audio fingerprinting without codecs: raw 16-bit PCM parses with plain
  * byte arithmetic (no library), and the fingerprint is a 64-bit
  * energy-envelope hash — integer mean |amplitude| over 65 windows,
  * bit i = envelope(i) < envelope(i+1). The exact analogue of the image
  * dHash: comparisons of adjacent window energies are invariant under
  * global gain changes (volume-normalized copies collide) and robust to
  * small noise, while any structural change to the loudness contour flips
  * bits. Near-dup then rides the same guarded banded-Hamming machinery
  * as images and simhash ([[NearDup.hammingPairs]]).
  *
  * Real compressed audio (MP3/FLAC) would decode to exactly this PCM
  * boundary; the container has no audio codecs, so PCM is the honest
  * decode contract — everything downstream of it is real. */
object Audio {

  /** Parse a 16-bit little-endian PCM payload (truncating a trailing odd
    * byte). Returns signed samples. */
  def pcm16(payload: Array[Byte]): Array[Int] = {
    if (payload == null) return Array.empty
    val n = payload.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((payload(2 * i + 1) << 8) | (payload(2 * i) & 0xff)).toShort
      i += 1
    }
    out
  }

  /** Integer mean |amplitude| over `k` equal windows (same floor-boundary
    * integer area-average rule as [[Images.gridLuma]]). Empty input
    * yields all zeros. */
  private[multimodal] def envelope(samples: Array[Int], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    if (samples.isEmpty) return out
    var i = 0
    while (i < k) {
      val s0 = i * samples.length / k
      val s1 = math.max((i + 1) * samples.length / k, s0 + 1)
      var sum = 0L
      var s = s0
      while (s < math.min(s1, samples.length)) {
        sum += math.abs(samples(s)); s += 1
      }
      out(i) = sum / math.max(math.min(s1, samples.length) - s0, 1)
      i += 1
    }
    out
  }

  /** 64-bit energy-envelope hash: 65 windows, bit i set when window i is
    * strictly quieter than window i+1. */
  def envelopeHash64(samples: Array[Int]): Long = {
    val env = envelope(samples, 65)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (env(i) < env(i + 1)) bits |= 1L << i
      i += 1
    }
    bits
  }

  final case class AudioIn(audio_id: Long, content: Array[Byte])
  final case class AudioHash(audio_id: Long, n_samples: Long, envhash: Long)
  private implicit val audioInEnc: Encoder[AudioIn] =
    Encoders.product[AudioIn]
  private implicit val audioHashEnc: Encoder[AudioHash] =
    Encoders.product[AudioHash]

  /** Fingerprint a binary PCM column: (audio_id, n_samples, envhash).
    * Empty payloads yield the zero hash (callers filter n_samples = 0 if
    * they want them gone); the typed mapPartitions boundary matches the
    * image family. */
  def hashAudio(df: DataFrame, idCol: String, bytesCol: String,
      batchSize: Int = 64): DataFrame =
    df.select(col(idCol).cast("long").as("audio_id"),
        col(bytesCol).as("content")).as[AudioIn]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { m =>
            val s = pcm16(m.content)
            AudioHash(m.audio_id, s.length.toLong, envelopeHash64(s))
          }
        }
      }.toDF()

  /** Perceptual audio near-dup: banded Hamming join over the envelope
    * hash — exact for maxHamming < 4 bands (pigeonhole), same guard as
    * the image path. */
  def nearDupPairs(hashes: DataFrame, idCol: String = "audio_id",
      hashCol: String = "envhash", maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    NearDup.hammingPairs(hashes, idCol, hashCol, bands = 4,
      maxHamming = maxHamming, maxBucketSize = maxBucketSize)

  /** Deterministic synthetic PCM: a loudness contour shaped by an
    * integer mix of (patternId, window) — 65 windows of constant
    * amplitude square-ish wave, so the envelope recovers the contour
    * exactly. Real bytes for specs/benches/fixture corpora (the audio
    * twin of [[Images.cellPatternPng]]). */
  def patternPcm(patternId: Long, nSamples: Int): Array[Byte] = {
    require(nSamples >= 65,
      s"patternPcm needs >= 65 samples (one per window), got $nSamples")
    val out = new Array[Byte](nSamples * 2)
    var s = 0
    var w = 0
    while (s < nSamples) {
      // same floor boundaries as envelope's windows (s0 = w·n/65): advance
      // while s crosses the next boundary, so each sample lands in exactly
      // the window envelope will average it into — the contour round-trips
      // exactly for ANY nSamples >= 65, not just multiples of 65
      while (w < 64 && s >= (w + 1) * nSamples / 65) w += 1
      var v = (patternId * 1000003L + w * 7919L + 0x9e3779b9L).toInt
      v ^= v >>> 15; v *= 0x85ebca6b
      v ^= v >>> 13; v *= 0xc2b2ae35
      v ^= v >>> 16
      val amp = (v & 0x3fff) // 0..16383, safe from overflow at any gain<=2
      val sample = if (s % 2 == 0) amp else -amp // square-ish carrier
      out(2 * s) = (sample & 0xff).toByte
      out(2 * s + 1) = ((sample >> 8) & 0xff).toByte
      s += 1
    }
    out
  }
}
