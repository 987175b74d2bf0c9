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

  /** Exact row count of a stored parquet table from its FILE FOOTERS —
    * the metadata-only equivalent of `spark.read.parquet(path).count()`
    * (parquet footers record per-row-group row counts; no data pages
    * are touched, and there are no deletes/filters in any graft store,
    * so the two numbers are identical by the format's contract).
    *
    * Why: the index-lifecycle composites gate their control flow
    * (compaction triggers, fixture floors, bucket counts) on segment
    * row counts, and each `count()` is a full Spark JOB — scheduler
    * round trip, task launch, AQE — serialized into the build's
    * critical path. At fixture scale those jobs ARE the cost (~0.1–0.3 s
    * apiece, ~10 per composite); at production scale a driver-side
    * footer read of a bounded segment (CellStore caps stores at ≤4096
    * block files; centroid tables are 1–2 files) is likewise cheaper
    * than a distributed count. Guard: stores larger than
    * [[FooterCountMaxFiles]] fall back to the distributed count — a
    * driver-serial footer sweep over an unbounded file set would be the
    * §5 driver-bottleneck anti-pattern.
    *
    * Counts only live data files (part-*), mirroring Spark's own
    * InMemoryFileIndex filter (no `_SUCCESS`/`_metadata`/hidden files);
    * recurses through partition dirs (`bucket=N/`). */
  private val FooterCountMaxFiles = 512

  def parquetRowCount(spark: org.apache.spark.sql.SparkSession,
                      path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    var overflow = false
    while (!overflow && it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) {
        files += f
        if (files.size > FooterCountMaxFiles) overflow = true
      }
    }
    if (overflow) spark.read.parquet(path).count()
    else files.iterator.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
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
