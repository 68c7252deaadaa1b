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
}
