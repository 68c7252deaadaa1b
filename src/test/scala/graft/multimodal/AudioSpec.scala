package graft.multimodal

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  private def scaleGain(pcm: Array[Byte], k: Int): Array[Byte] = {
    val s = Audio.pcm16(pcm)
    val out = new Array[Byte](s.length * 2)
    s.indices.foreach { i =>
      val v = s(i) * k
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  test("pcm16: little-endian signed parse, odd tail truncates") {
    // 0x0102 = 258, 0xFFFF = -1, trailing odd byte dropped
    val b = Array[Byte](0x02, 0x01, -1, -1, 0x7f)
    assert(Audio.pcm16(b).toSeq == Seq(258, -1))
    assert(Audio.pcm16(Array.empty[Byte]).isEmpty)
    assert(Audio.pcm16(null).isEmpty)
  }

  test("envelope: hand-computed windows; hash bit rule") {
    // 4 samples over 2 windows: |10|,|−20| -> 15 ; |30|,|−40| -> 35
    val env = Audio.envelope(Array(10, -20, 30, -40), 2)
    assert(env.toSeq == Seq(15L, 35L))
    // rising two-window contour at 65-window scale: low half, loud half
    val s = Array.tabulate(130)(i => if (i < 65) 100 else 10000)
    val h = Audio.envelopeHash64(s)
    // exactly one strict rise at the boundary window
    assert(java.lang.Long.bitCount(h) >= 1)
  }

  test("envelope hash is gain-invariant; distinct contours far apart") {
    val a = Audio.patternPcm(1L, 1300)
    val b = Audio.patternPcm(2L, 1300)
    def h(p: Array[Byte]) = Audio.envelopeHash64(Audio.pcm16(p))
    val ham2x = java.lang.Long.bitCount(h(a) ^ h(scaleGain(a, 2)))
    assert(ham2x <= 1, s"gain doubling moved the envelope hash: $ham2x bits")
    assert(java.lang.Long.bitCount(h(a) ^ h(b)) > 10)
    // same pattern at a different sample count: same contour, same hash —
    // including counts NOT divisible by 65 (window boundaries in
    // patternPcm and envelope share the same floor formula)
    assert(h(a) == h(Audio.patternPcm(1L, 2600)))
    assert(h(a) == h(Audio.patternPcm(1L, 1301)))
    assert(h(a) == h(Audio.patternPcm(1L, 997)))
    assert(h(a) == h(Audio.patternPcm(1L, 65)))
  }

  test("hashAudio + nearDupPairs find the planted duplicate") {
    import spark.implicits._
    val rows = Seq(
      (1L, Audio.patternPcm(1L, 1300)),
      (2L, Audio.patternPcm(2L, 1300)),
      (3L, scaleGain(Audio.patternPcm(1L, 1300), 2)), // gain copy of 1
      (4L, Audio.patternPcm(4L, 1300)))
      .toDF("audio_id", "content")
    val hashes = Audio.hashAudio(rows, "audio_id", "content")
      .localCheckpoint()
    assert(hashes.count() == 4)
    val pairs = Audio.nearDupPairs(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)))
  }
}
