package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY.md §2B streaming row):
  * watermarked dedup and custom keyed state via mapGroupsWithState.
  * Both bind to the same events schema as the batch plans; state is
  * per-key and watermark-bounded — O(distinct keys in the watermark
  * window) per executor, never O(stream).
  */
object StatefulOps {

  final case class UserTotals(user_id: Long, n: Long, total: Double)

  /** Streaming dedup on (user_id, event_type) bounded by the event-time
    * watermark: exact within the window, state evicted beyond it — the
    * streaming counterpart of batch dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Custom keyed state: running per-user totals via mapGroupsWithState.
    * Update-mode output; one state row per user. */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          UserTotals(uid, n, s)
      }
      .toDF()
  }

  /** Drive a stateful plan over a parquet directory of events to
    * completion against a memory sink (update mode). */
  def runUpdateStreaming(spark: SparkSession, dir: String, name: String,
                         plan: DataFrame => DataFrame): DataFrame = {
    val src = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val q = plan(src).writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Append-mode driver (for dedup, which forbids complete/update). */
  def runAppendStreaming(spark: SparkSession, dir: String, name: String,
                         plan: DataFrame => DataFrame): DataFrame = {
    val src = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val q = plan(src).writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
