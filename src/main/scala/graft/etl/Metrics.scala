package graft.etl

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Job diagnostics observer (SURVEY.md §2B "Observer"): a SparkListener
  * that counts tasks/bytes/rows per stage, exposed as a DataFrame — the
  * engine-native re-expression of the reference extension's logging
  * callbacks (reference `LocalStorageTransportExtension.scala:30-33`
  * logs object counts/bytes/elapsed).
  *
  * Listener events arrive on the driver's event bus — O(stages), never
  * O(rows) — so this costs nothing at 100 TB.
  */
final case class StageMetrics(stageId: Int, tasks: Long, inputBytes: Long,
                              inputRecords: Long, shuffleWriteBytes: Long,
                              elapsedMs: Long)

final class MetricsObserver extends SparkListener {

  private val tasksByStage = mutable.Map.empty[Int, Long].withDefaultValue(0L)
  private val stages = mutable.ArrayBuffer.empty[StageMetrics]
  private var jobsEnded = 0L

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    tasksByStage(t.stageId) += 1
  }

  override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
    val info = s.stageInfo
    val m = info.taskMetrics
    stages += StageMetrics(
      info.stageId,
      tasksByStage(info.stageId),
      if (m == null) 0L else m.inputMetrics.bytesRead,
      if (m == null) 0L else m.inputMetrics.recordsRead,
      if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten,
      (for {s0 <- info.submissionTime; c <- info.completionTime} yield c - s0).getOrElse(0L))
  }

  override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized { jobsEnded += 1 }

  def jobCount: Long = synchronized(jobsEnded)

  /** Snapshot as a DataFrame for engine-side diagnostics queries. */
  def toDF(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    stages.toSeq.toDF()
  }
}

object MetricsObserver {
  /** Install a fresh observer on the session's listener bus. */
  def install(spark: SparkSession): MetricsObserver = {
    val o = new MetricsObserver
    spark.sparkContext.addSparkListener(o)
    o
  }
}
