package graft

/** Shared filesystem helpers for scratch-dir lifecycles (the coordinated
  * commit's staging roots and the hermetic index-build queries). One
  * copy — four modules previously carried byte-identical private
  * versions (review r8). */
private[graft] object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
