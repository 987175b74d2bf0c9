package graft.etl

import scala.collection.mutable

/** Job lifecycle observer — the callback vocabulary of the reference's
  * `StorageTransportExtension` (reference
  * `LocalStorageTransportExtension.scala:11-100` and the coordinated
  * variant `LocalCoordinatedStorageTransportExtension.scala:40-50`),
  * re-expressed as a plain trait our sinks/commit protocol invoke.
  *
  * Ordering contract (asserted by CoordinatedCommitSpec):
  *   onTransportStart
  *     → onObjectPersisted*            (per staged file)
  *     → onAllObjectsPersisted         (barrier: everything staged)
  *     → onStageReady                  (coordinated: all destinations staged)
  *     → onStageSucceeded(cluster)*    (per destination)
  *     → onImportReady                 (all destinations staged OK)
  *     → onImportSucceeded(cluster)*   (per destination made visible)
  *     → onJobSucceeded | onJobFailed
  */
trait JobObserver {
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

/** Records the callback sequence — test double. */
final class CollectingObserver extends JobObserver {
  val events = mutable.ArrayBuffer.empty[String]
  private def add(e: String): Unit = synchronized { events += e }
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
