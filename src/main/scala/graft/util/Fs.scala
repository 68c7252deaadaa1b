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
    * mid-write leaves any previous version intact (the next write
    * consumes the orphaned `.tmp` via REPLACE_EXISTING on its own
    * rename). The shared discipline for every driver-side metadata
    * file (state metas, index metas) — a bare `Files.write` on a file
    * that is ever re-read is the truncation bug class the r10 audit
    * found. */
  def writeFileAtomic(path: Path, bytes: Array[Byte]): Unit = {
    import java.nio.file.StandardCopyOption
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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
