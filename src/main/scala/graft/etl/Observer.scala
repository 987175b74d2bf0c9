package graft.etl

import scala.collection.mutable

/** Per-destination storage access: region + bucket + the credentials
  * that grant access to it (reference `StorageAccessConfiguration`,
  * `LocalCoordinatedStorageTransportExtension.scala:23-37`). Values are
  * opaque strings here — the local transport doesn't dial an object
  * store — but the shape is the reference's. */
final case class StorageCredentials(accessKeyId: String, secretKey: String,
                                    sessionToken: String)
final case class StorageAccessConfig(region: String, bucket: String,
                                     credentials: StorageCredentials)

/** Job-wide storage transport configuration: a key prefix + tags, write
  * access, and per-cluster read access (reference
  * `StorageTransportConfiguration`, coordinated variant
  * `LocalCoordinatedStorageTransportExtension.scala:17-38`). */
final case class StorageTransportConfig(
    keyPrefix: String,
    tags: Map[String, String],
    writeAccess: StorageAccessConfig,
    readAccessByCluster: Map[String, StorageAccessConfig])

/** Credential-rotation hook (reference `setCredentialChangeListener`,
  * `LocalStorageTransportExtension.scala:26`): the transport registers a
  * listener; the extension calls it when tokens rotate mid-job. */
trait CredentialChangeListener {
  def onCredentialsChanged(clusterId: String,
                           credentials: StorageCredentials): Unit
}

/** Job lifecycle observer — the callback vocabulary of the reference's
  * `StorageTransportExtension` (reference
  * `LocalStorageTransportExtension.scala:11-100` and the coordinated
  * variant `LocalCoordinatedStorageTransportExtension.scala:40-50`),
  * re-expressed as a plain trait our sinks/commit protocol invoke.
  *
  * Ordering contract (asserted by CoordinatedCommitSpec):
  *   initialize                        (framework handshake, before any I/O)
  *     → onTransportStart
  *     → onObjectPersisted*            (per staged file)
  *     → onAllObjectsPersisted         (barrier: everything staged)
  *     → onStageReady                  (coordinated: all destinations staged)
  *     → onStageSucceeded(cluster)*    (per destination)
  *     → onImportReady                 (all destinations staged OK)
  *     → onImportSucceeded(cluster)*   (per destination made visible)
  *     → onJobSucceeded | onJobFailed
  */
trait JobObserver {

  /** Framework handshake before any I/O (reference `initialize`,
    * `LocalStorageTransportExtension.scala:73-76`): the transport hands
    * the observer its jobId and registers the credential-rotation hook.
    * Default: keep the listener unused. */
  def initialize(jobId: String, listener: CredentialChangeListener): Unit = ()

  /** Storage configuration this job should write/read with (reference
    * `getStorageConfiguration`, `LocalStorageTransportExtension.scala:80-88`).
    * None ⇒ the transport uses its destination paths as-is (local FS). */
  def storageConfiguration: Option[StorageTransportConfig] = None

  def onTransportStart(jobId: String): Unit = ()
  def onObjectPersisted(bucket: String, key: String, bytes: Long): Unit = ()
  def onAllObjectsPersisted(objects: Long, bytes: Long): Unit = ()
  def onStageReady(jobId: String): Unit = ()
  def onStageSucceeded(clusterId: String): Unit = ()
  def onStageFailed(clusterId: String, cause: Throwable): Unit = ()
  def onImportReady(jobId: String): Unit = ()
  def onImportSucceeded(clusterId: String): Unit = ()
  def onImportFailed(clusterId: String, cause: Throwable): Unit = ()
  def onJobSucceeded(jobId: String): Unit = ()
  def onJobFailed(jobId: String, cause: Throwable): Unit = ()
}

object NoopObserver extends JobObserver

/** Records the callback sequence — test double (open for per-test
  * overrides, e.g. supplying a storageConfiguration). */
class CollectingObserver extends JobObserver {
  val events = mutable.ArrayBuffer.empty[String]
  var credentialListener: Option[CredentialChangeListener] = None
  private def add(e: String): Unit = synchronized { events += e }
  override def initialize(jobId: String, l: CredentialChangeListener): Unit = {
    credentialListener = Some(l); add(s"initialize:$jobId")
  }
  override def onTransportStart(jobId: String): Unit = add(s"transportStart:$jobId")
  override def onObjectPersisted(b: String, k: String, n: Long): Unit = add(s"objectPersisted:$k")
  override def onAllObjectsPersisted(o: Long, n: Long): Unit = add(s"allObjectsPersisted:$o")
  override def onStageReady(jobId: String): Unit = add(s"stageReady:$jobId")
  override def onStageSucceeded(c: String): Unit = add(s"stageSucceeded:$c")
  override def onStageFailed(c: String, e: Throwable): Unit = add(s"stageFailed:$c")
  override def onImportReady(jobId: String): Unit = add(s"importReady:$jobId")
  override def onImportSucceeded(c: String): Unit = add(s"importSucceeded:$c")
  override def onImportFailed(c: String, e: Throwable): Unit = add(s"importFailed:$c")
  override def onJobSucceeded(jobId: String): Unit = add(s"jobSucceeded:$jobId")
  override def onJobFailed(jobId: String, e: Throwable): Unit = add(s"jobFailed:$jobId")
}
