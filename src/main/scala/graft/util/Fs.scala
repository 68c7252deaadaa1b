package graft.util

import java.io.File

/** The one recursive-delete helper (Bench temp warehouses, cached index
  * dirs, compaction swap dirs all share it — a symlink/permission fix
  * lands once). */
object Fs {
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  import java.nio.file.{Files, Path}

  /** Crash-safe small-file write: temp in the same directory + atomic
    * rename, so a reader never observes a truncated file and a crash
    * mid-write leaves any previous version intact. The shared
    * discipline for every driver-side metadata file (state metas,
    * index metas) — a bare `Files.write` on a file that is ever
    * re-read is the truncation bug class the r10 audit found.
    *
    * Two durability details the r11 advice audit demanded:
    *   - the temp name carries pid + thread id, so two concurrent
    *     writers to the same meta (overlapping drains) never race on a
    *     shared `.tmp` — each renames its OWN temp, last rename wins,
    *     neither throws. A crash may orphan a uniquely-named temp;
    *     those are dot-prefixed, bytes-sized, and never re-read.
    *   - the temp's channel is force(true)'d before the rename, and the
    *     parent directory is fsynced after it where the platform allows
    *     (Linux does; filesystems that refuse directory opens degrade
    *     to rename-ordering semantics, which is the best they offer). */
  def writeFileAtomic(path: Path, bytes: Array[Byte]): Unit = {
    import java.nio.file.{StandardCopyOption, StandardOpenOption}
    val tmp = path.resolveSibling(
      s".${path.getFileName}.${ProcessHandle.current.pid}-${Thread.currentThread.getId}.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) }
    finally ch.close()
    try Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    try {
      val dir = java.nio.channels.FileChannel.open(path.getParent,
        StandardOpenOption.READ)
      try dir.force(true) finally dir.close()
    } catch { case _: java.io.IOException => () }
  }

  /** Recovery preamble for [[swapInNew]]'s two-rename window: a crash
    * between `move(cur, old)` and `move(new, cur)` leaves `cur` missing
    * and `cur.old` intact — restore it. Call before READING a
    * swap-maintained dir (compactors call it before folding; half-done
    * `.new` output is deleted by the next swap attempt). No-op when
    * `cur` exists. */
  def recoverSwap(cur: Path): Unit = {
    val old = cur.resolveSibling(cur.getFileName.toString + ".old")
    if (!Files.exists(cur) && Files.exists(old)) Files.move(old, cur)
  }

  /** Replace dir `cur` with `cur.new` via two renames, crash-safe up to
    * [[recoverSwap]]: at every instant either `cur` or `cur.old` holds
    * the complete previous state, and `cur`, when present, is never a
    * mix of old and new. The window where `cur` is briefly missing is
    * repaired by the recovery preamble on the next swap or read. */
  def swapInNew(cur: Path): Unit = {
    recoverSwap(cur)
    val nw = cur.resolveSibling(cur.getFileName.toString + ".new")
    val old = cur.resolveSibling(cur.getFileName.toString + ".old")
    deleteRecursively(old.toFile)
    if (Files.exists(cur)) Files.move(cur, old)
    Files.move(nw, cur)
    deleteRecursively(old.toFile)
  }
}
