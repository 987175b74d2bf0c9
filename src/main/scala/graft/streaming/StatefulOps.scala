package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  final case class UserSpend(user_id: Long, n: Long, total_c: Long, max_c: Long)

  /** StatefulProcessor for the Spark 4 `transformWithState` API — the
    * successor to mapGroupsWithState with named, individually-evictable
    * state variables (ValueState/ListState/MapState + per-state TTL) on
    * the RocksDB store. One ValueState holds the per-user (count, sum,
    * max) triple; state is O(distinct users), disk-backed, and
    * changelog-checkpointed by the store — the shape that holds when
    * keyspace outgrows executor heap at 100 TB. */
  class SpendProcessor extends StatefulProcessor[Long, (Long, Double), UserSpend] {
    @transient private var agg: ValueState[(Long, Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double, Double)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double)],
                                 timers: TimerValues): Iterator[UserSpend] = {
      var (n, s, m) = if (agg.exists()) agg.get() else (0L, 0.0, Double.MinValue)
      rows.foreach { case (_, v) => n += 1; s += v; if (v > m) m = v }
      agg.update((n, s, m))
      // cents quantization: round-to-NEAREST for the same reason as q29
      Iterator.single(UserSpend(uid, n, math.round(s * 100), math.round(m * 100)))
    }
  }

  /** Running per-user spend via [[SpendProcessor]]. Requires the RocksDB
    * state store provider (transformWithState's backing store). */
  def runningUserSpend(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new SpendProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Batch counterpart of [[runningUserSpend]] (q90): the final state of
    * the transformWithState stream — per-user count, cents-quantized
    * total and max (StatefulSpec asserts streaming ≡ batch). */
  def userSpendBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 100, 0).cast("long").as("total_c"),
        round(max(col("value")) * 100, 0).cast("long").as("max_c"))
      .orderBy(col("user_id"))

  val userSpendBatchSql: String =
    """SELECT user_id, count(*) AS n,
      |  CAST(round(sum(value) * 100, 0) AS BIGINT) AS total_c,
      |  CAST(round(max(value) * 100, 0) AS BIGINT) AS max_c
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

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

  /** Stream-stream interval join: click events joined with follow-up
    * events of the same user within (click_ts, click_ts + 5 min] — the
    * streaming counterpart of the batch range join (q21 shape).
    *
    * Both sides carry a watermark, and the join condition bounds each
    * side's event time relative to the other, so Structured Streaming can
    * evict join state once the watermark passes the interval: state is
    * O(events inside the watermark horizon), never O(stream). Emits the
    * matched row pairs (append mode — the only mode stream-stream joins
    * support). */
  def streamIntervalJoin(clicks: DataFrame, followups: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "10 minutes")
    val f = followups
      .select(col("user_id").as("fu"), col("ts").as("fts"),
        col("event_type").as("ftype"))
      .withWatermark("fts", "10 minutes")
    c.join(f,
      col("cu") === col("fu") && col("fts") > col("cts") &&
        col("fts") <= col("cts") + expr("INTERVAL 5 MINUTES"))
  }

  /** Batch-shaped registration of [[streamIntervalJoin]] (q27): the same
    * plan builder run over batch DataFrames — `withWatermark` is a no-op
    * outside streaming (Catalyst's EliminateEventTimeWatermark) — with
    * timestamps projected to micros and a total order for the oracle
    * compare. StreamingSpec asserts batch ≡ streaming on the same rows. */
  def intervalJoinBatch(events: DataFrame): DataFrame =
    streamIntervalJoin(events, events)
      .select(col("cu").as("user_id"), unix_micros(col("cts")).as("click_us"),
        unix_micros(col("fts")).as("follow_us"), col("ftype"))
      .orderBy(col("user_id"), col("click_us"), col("follow_us"), col("ftype"))

  val intervalJoinBatchSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events)
      |SELECT c.user_id AS user_id, epoch_us(c.ts) AS click_us,
      |  epoch_us(f.ts) AS follow_us, f.event_type AS ftype
      |FROM e c JOIN e f ON c.user_id = f.user_id
      |  AND f.ts > c.ts AND f.ts <= c.ts + INTERVAL 5 MINUTE
      |WHERE c.event_type = 'click'
      |ORDER BY 1, 2, 3, 4""".stripMargin

  /** Stream-stream LEFT OUTER interval join — every click with its
    * follow-up events, null-extended when none arrives in the window.
    * The semantics the inner join ([[streamIntervalJoin]]) cannot
    * express: "clicks that never converted". In append-mode streaming
    * an outer result can only be emitted once the WATERMARK proves no
    * match can still arrive, so unmatched left rows are held in join
    * state until the horizon (interval + delay) expires and then emit
    * null-extended — state stays O(watermark horizon), never O(stream),
    * exactly as for the inner form. */
  def streamIntervalJoinOuter(clicks: DataFrame, followups: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "10 minutes")
    val f = followups
      .select(col("user_id").as("fu"), col("ts").as("fts"),
        col("event_type").as("ftype"))
      .withWatermark("fts", "10 minutes")
    c.join(f,
      col("cu") === col("fu") && col("fts") > col("cts") &&
        col("fts") <= col("cts") + expr("INTERVAL 5 MINUTES"),
      "left_outer")
  }

  /** Batch-shaped registration of [[streamIntervalJoinOuter]] (q142) —
    * the same plan builder over batch frames, ordered with the null
    * follow-ups FIRST on both engines (Spark's ASC default; DuckDB
    * needs it spelled out). StreamingSpec asserts batch ≡ streaming
    * including the watermark-flushed unmatched rows. */
  def intervalJoinOuterBatch(events: DataFrame): DataFrame =
    streamIntervalJoinOuter(events, events)
      .select(col("cu").as("user_id"), unix_micros(col("cts")).as("click_us"),
        unix_micros(col("fts")).as("follow_us"), col("ftype"))
      .orderBy(col("user_id"), col("click_us"), col("follow_us"), col("ftype"))

  val intervalJoinOuterBatchSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events)
      |SELECT c.user_id AS user_id, epoch_us(c.ts) AS click_us,
      |  epoch_us(f.ts) AS follow_us, f.event_type AS ftype
      |FROM (SELECT * FROM e WHERE event_type = 'click') c
      |LEFT JOIN e f ON c.user_id = f.user_id
      |  AND f.ts > c.ts AND f.ts <= c.ts + INTERVAL 5 MINUTE
      |ORDER BY user_id, click_us, follow_us NULLS FIRST, ftype NULLS FIRST""".stripMargin

  /** Batch counterpart of [[dedupWithinWatermark]] (q28). Streaming keeps
    * each key's first ARRIVAL, which is only deterministic given an
    * ordered source; the batch shape pins the same semantics to event
    * order — min (ts, event_id) per (user_id, event_type) — so the result
    * is engine-independent and oracle-checkable. */
  def statefulDedupBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("first_us"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val statefulDedupBatchSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) ts
      |           FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts, event_id) rn FROM e)
      |SELECT user_id, event_type, epoch_us(ts) AS first_us, event_id
      |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Batch counterpart of [[runningUserTotals]] (q29): the final state of
    * the mapGroupsWithState stream — per-user event count and value total
    * (StatefulSpec asserts streaming ≡ batch on the same rows). The total
    * is quantized to whole cents by round-to-NEAREST, not the q19/q44
    * floor: `value` is cents-exact, so every group total sits exactly on
    * a floor boundary and summation-order noise (~1e-9) would flip it;
    * against the nearest integer that noise is harmless. */
  def userTotalsBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 100, 0).cast("long").as("total_c"))
      .orderBy(col("user_id"))

  val userTotalsBatchSql: String =
    """SELECT user_id, count(*) AS n,
      |  CAST(round(sum(value) * 100, 0) AS BIGINT) AS total_c
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

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
