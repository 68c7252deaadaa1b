package graft.util

import java.util.zip.Deflater

/** DEFLATE helper for the compression-ratio quality signal (the
  * Gopher/MassiveText-family "too compressible = boilerplate, too
  * incompressible = noise" heuristic — public knowledge, Rae et al.
  * 2021 §A1.2). One Deflater per thread, reset per row: allocation-free
  * on the hot path. Level 6 raw-deflate (nowrap — no zlib header, so
  * the length measures content, not framing). Output lengths are
  * deterministic per JVM zlib build; cross-engine replay is NOT
  * guaranteed, so queries over this signal are spec-gated (invariants +
  * same-JVM cross-check), not DuckDB-oracled. */
object Deflate {
  private val local: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, true)
  }

  /** Compressed byte length of `bytes` under raw DEFLATE level 6. */
  def length(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
