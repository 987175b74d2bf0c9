package graft.etl

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Two-phase coordinated write across multiple destinations — the
  * semantics of the reference's coordinated S3_COMPAT transport
  * (reference `LocalCoordinatedStorageTransportExtension.scala:40-50`,
  * config `App.scala:208-235`):
  *
  *   1. STAGE: data is written to a hidden staging dir under EVERY
  *      destination. Only when all destinations hold a complete staged
  *      copy does the coordinator signal `onStageReady` — nothing is
  *      visible yet.
  *   2. IMPORT: each staged copy is made visible by a single atomic
  *      rename (staging dir → committed dir) plus a manifest file. Any
  *      failure before phase 2 leaves every destination clean of
  *      visible data.
  *
  * On a real object store the atomic rename becomes a manifest-commit
  * (write manifest last; readers resolve through it) — the directory
  * protocol here is the local-FS equivalent with the same barrier
  * structure and observer callback ordering.
  */
object CoordinatedCommit {

  final case class Destination(clusterId: String, root: String)

  private def stagingDir(d: Destination, jobId: String) =
    s"${d.root}/.staging-$jobId"
  private def committedDir(d: Destination, jobId: String) =
    s"${d.root}/commit-$jobId"

  /** Run the two-phase write. Returns committed dirs per destination.
    * `failStage` injects a phase-1 fault (tests). */
  def write(df: DataFrame, destinations: Seq[Destination], jobId: String,
            observer: JobObserver = NoopObserver,
            failStage: Option[String] = None): Seq[String] = {
    // Framework handshake before any I/O (reference `initialize` +
    // `setCredentialChangeListener`): the transport owns the rotation
    // sink; an observer backed by a real credential vendor calls it when
    // tokens rotate mid-job. The local transport records the rotation —
    // an object-store transport would swap its client credentials.
    val rotated = scala.collection.concurrent.TrieMap.empty[String, StorageCredentials]
    observer.initialize(jobId,
      (clusterId: String, creds: StorageCredentials) => rotated(clusterId) = creds)
    // Storage configuration (reference `getStorageConfiguration`): when
    // the observer supplies one, persisted objects are reported under its
    // bucket + key prefix rather than the raw destination path.
    val cfg = observer.storageConfiguration
    def bucketOf(d: Destination): String =
      cfg.flatMap(_.readAccessByCluster.get(d.clusterId)).map(_.bucket)
        .getOrElse(d.root)
    def keyOf(name: String): String =
      cfg.map(c => s"${c.keyPrefix}/$name").getOrElse(name)
    observer.onTransportStart(jobId)
    try {
      // ---- phase 1: stage everywhere, nothing visible ----
      var totalObjects = 0L
      var totalBytes = 0L
      destinations.foreach { d =>
        val dir = stagingDir(d, jobId)
        try {
          if (failStage.contains(d.clusterId))
            throw new RuntimeException(s"injected stage failure at ${d.clusterId}")
          df.write.mode("overwrite").parquet(dir)
          ParquetSink.listParquet(dir).foreach { f =>
            totalObjects += 1; totalBytes += f.length()
            observer.onObjectPersisted(bucketOf(d), keyOf(f.getName), f.length())
          }
          observer.onStageSucceeded(d.clusterId)
        } catch {
          case e: Throwable =>
            observer.onStageFailed(d.clusterId, e)
            destinations.foreach(x => graft.FsUtil.deleteRecursively(new File(stagingDir(x, jobId))))
            throw e
        }
      }
      observer.onAllObjectsPersisted(totalObjects, totalBytes)
      observer.onStageReady(jobId)

      // ---- phase 2: make visible via atomic rename + manifest ----
      observer.onImportReady(jobId)
      val committed = destinations.map { d =>
        val target = committedDir(d, jobId)
        try {
          Files.move(Paths.get(stagingDir(d, jobId)), Paths.get(target),
            StandardCopyOption.ATOMIC_MOVE)
          val names = ParquetSink.listParquet(target).map(_.getName)
          Files.writeString(Paths.get(s"$target/_MANIFEST"),
            names.mkString("\n"))
          observer.onImportSucceeded(d.clusterId)
          target
        } catch {
          case e: Throwable => observer.onImportFailed(d.clusterId, e); throw e
        }
      }
      observer.onJobSucceeded(jobId)
      committed
    } catch {
      case e: Throwable => observer.onJobFailed(jobId, e); throw e
    }
  }

  /** A destination's visible (committed) data dirs. */
  def visible(dest: Destination): Seq[String] = {
    val root = new File(dest.root)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("commit-"))
      .filter(f => new File(f, "_MANIFEST").exists())
      .map(_.getPath).toSeq.sorted
  }

}
