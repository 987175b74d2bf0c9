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

  /** Recursive directory copy — the segment-SNAPSHOT primitive (q211):
    * a serving system pins a store state by copying its segment
    * manifest; this local stand-in copies the (fixture-sized) segment
    * files themselves. Symlinks are SKIPPED, never followed (ADVICE
    * r14 #3): a linked directory would otherwise be deep-copied — or
    * loop — and no segment store legitimately contains links. */
  def copyRecursively(src: java.io.File, dst: java.io.File): Unit = {
    if (java.nio.file.Files.isSymbolicLink(src.toPath)) ()
    else if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).getOrElse(Array.empty).foreach { c =>
        copyRecursively(c, new java.io.File(dst, c.getName))
      }
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Session-scoped stored-index root cache shared by the serve-only
    * registrations (q179/q180/q183 and the streaming ANN path): the
    * index is built ONCE per (JVM, cache key) and later calls read the
    * stored tables, so the serve-leg bench medians time serving alone.
    *
    * Two r9-verdict housekeeping holes closed here: every root is
    * removed by ONE JVM shutdown hook (previously each bench/verify/test
    * run leaked a stored index per corpus tag into /tmp), and callers
    * put a cheap corpus CHECKSUM — not just the sfDir tag — into the
    * key, so a corpus changing under the same path can never be served
    * a stale index. */
  private[graft] object ServedRoots {
    private val roots =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    locally {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        roots.values.forEach(r => deleteRecursively(new java.io.File(r)))))
    }
    /** The cached root for `key`, building the index under a fresh temp
      * dir (named after `prefix`) on first use. */
    def getOrBuild(key: String, prefix: String)(build: String => Unit): String =
      roots.computeIfAbsent(key, _ => {
        val r = java.nio.file.Files.createTempDirectory(prefix).toString
        // a failed build never registers in `roots`, so the shutdown
        // hook would not see its temp dir — delete it before rethrowing
        // (ADVICE r10), or each failed build leaks a directory
        try build(r)
        catch {
          case t: Throwable =>
            deleteRecursively(new java.io.File(r)); throw t
        }
        r
      })
  }
}
