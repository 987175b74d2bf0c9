package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-shaped operators over the `events` table (SURVEY.md §2B).
  *
  * Batch-first: each windowed aggregation is a plain DataFrame plan (so it
  * is DuckDB-oracle-checkable), and the identical plan can be bound to a
  * `readStream` source — Structured Streaming's incrementalization of
  * `window()`/`session_window()` aggregates is exactly the batch semantics
  * plus watermark-driven state eviction. `streamify` below does that
  * binding for tests; at 100 TB/day the same code runs with a real source
  * (Kafka/files) and checkpointing.
  */
object EventWindows {

  /** Tumbling 1-hour windows per event type. Epoch-aligned, same as
    * DuckDB's date_trunc. One shuffle on (window, event_type). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("val"))
      .orderBy(col("ws_us"), col("event_type"))

  val tumblingSql: String =
    """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS ws_us,
      |  event_type, count(*) AS n, round(sum(value), 2) AS val
      |FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin

  /** Sliding 1-hour windows every 30 minutes: each event lands in exactly
    * 2 windows. Spark expands via the built-in `window()` generator —
    * cost is 2× rows into one shuffle, not a self-join. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("n"), col("val"))
      .orderBy(col("ws_us"))

  val slidingSql: String =
    """WITH e AS (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) tb, value FROM events),
      |w AS (SELECT unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws, value FROM e)
      |SELECT epoch_us(ws) AS ws_us, count(*) AS n, round(sum(value), 2) AS val
      |FROM w GROUP BY 1 ORDER BY ws_us""".stripMargin

  /** Session windows: 10-minute inactivity gap per user. In streaming this
    * is `session_window` state merging; the batch plan is identical
    * semantics. A new session starts when the gap is >= 10 min (Spark
    * merges only strictly-overlapping [ts, ts+gap) intervals). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n"), col("val"))
      .orderBy(col("user_id"), col("session_start_us"))

  val sessionsSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, value FROM events),
      |g AS (SELECT user_id, ts, value,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |             OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, value,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM g)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
      |  count(*) AS n, round(sum(value), 2) AS val
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** q106: sessionized conversion funnel — per (user, 10-min-gap
    * session): did the session contain a click, a purchase, and a
    * purchase at-or-after its first click (the conversion)? One summary
    * row: session count, click/purchase session counts, conversions.
    * The behavioral-analytics shape (funnel over sessionized streams)
    * built from the q25 session machinery.
    *
    * 100 TB shape: ONE session_window aggregate (the same
    * state-merging shuffle q25 pays) computing min-click-ts /
    * max-purchase-ts per session via conditional min/max — mergeable
    * partial aggs, no self-join of the event stream, no second pass —
    * then a scalar roll-up. Same plan binds to readStream. */
  def sessionFunnel(events: DataFrame): DataFrame = {
    val click = when(col("event_type") === "click", col("ts"))
    val purchase = when(col("event_type") === "purchase", col("ts"))
    events
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(min(click).as("first_click"), max(purchase).as("last_purchase"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("first_click").isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when(col("last_purchase").isNotNull, 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("last_purchase") >= col("first_click"), 1L).otherwise(0L))
          .as("n_converted"))
  }

  /** Oracle: q25's lag/gap/cumsum session formulation with the same
    * conditional min/max per session. */
  val sessionFunnelSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events),
      |g AS (SELECT user_id, ts, event_type,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |             OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, event_type,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM g),
      |per AS (SELECT user_id, sid,
      |        min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
      |        max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      |      FROM s GROUP BY user_id, sid)
      |SELECT count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN last_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN last_purchase >= first_click THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      |FROM per""".stripMargin

  /** q97: time-series downsampling to OHLC bars — per (1-hour bucket,
    * event_type): open/close (first/last value by event time, ties on
    * event_id), low/high, count and volume. The standard raw-stream →
    * dashboard/feature-store compaction.
    *
    * 100 TB shape: open/close are min/max over struct(ts, event_id,
    * value) — MERGEABLE partial aggregates (O(1) map-side state per
    * bar), not window first_value/last_value (which would sort every
    * partition's full event stream before aggregating). One shuffle on
    * the bar key, partial+final all the way; identical plan binds to
    * readStream for incremental bars. */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        round(min(col("value")), 2).as("low"),
        round(max(col("value")), 2).as("high"),
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("vol"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        round(col("o.value"), 2).as("open"), round(col("c.value"), 2).as("close"),
        col("low"), col("high"), col("n"), col("vol"))
      .orderBy(col("ws_us"), col("event_type"))

  val ohlcBarsSql: String =
    """WITH e AS (SELECT event_type, event_id, value, CAST(ts AS TIMESTAMP) t FROM events),
      |b AS (SELECT *, date_trunc('hour', t) AS ws FROM e),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY ws, event_type ORDER BY t, event_id) ra,
      |        row_number() OVER (PARTITION BY ws, event_type ORDER BY t DESC, event_id DESC) rd
      |      FROM b)
      |SELECT epoch_us(ws) AS ws_us, event_type,
      |  round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
      |  round(max(CASE WHEN rd = 1 THEN value END), 2) AS close,
      |  round(min(value), 2) AS low, round(max(value), 2) AS high,
      |  count(*) AS n, round(sum(value), 2) AS vol
      |FROM r GROUP BY ws, event_type ORDER BY ws_us, event_type""".stripMargin

  /** The events schema as Spark reads it post nanos→micros conversion. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Bind a batch plan to a real Structured Streaming source: reads a
    * directory of parquet events (micros ts), applies `plan`, runs it to
    * completion against a memory sink, returns the result. Watermark
    * bounds state at `10 minutes` of event time.
    *
    * This is the `readStream → transform → writeStream` wiring the
    * engine exposes; tests drive it via a temp dir of converted events.
    */
  def runStreaming(spark: SparkSession, dir: String, name: String,
                   plan: DataFrame => DataFrame): DataFrame = {
    val src = spark.readStream.schema(eventsSchema).parquet(dir)
    val out = plan(src.withWatermark("ts", "10 minutes"))
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** q123: stream-static enrichment — the standard Structured Streaming
    * lookup pattern: a stream of events joins a STATIC dimension (here
    * customer, on user_id = c_custkey) to attach the market segment,
    * then aggregates revenue per (segment, event_type). Stream-static
    * inner joins are STATELESS in Structured Streaming (each micro-batch
    * probes the static side; no watermark, no join state), which is why
    * the dim side must broadcast — re-shuffling the stream every batch
    * would serialize the pipeline.
    *
    * The registered query is the batch binding (oracle-checkable); the
    * identical plan binds to readStream (StreamingSpec asserts
    * stream ≡ batch on the join). 100 TB/day shape: dim broadcast, one
    * shuffle of pre-aggregated (segment, type) partials. */
  def enrichedSegments(events: DataFrame, customer: DataFrame): DataFrame =
    enrichJoin(events, customer)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .select(col("c_mktsegment").as("segment"), col("event_type"), col("n"), col("val"))
      .orderBy(col("segment"), col("event_type"))

  /** The stream-bindable join stage of q123 (no agg — append-mode legal). */
  def enrichJoin(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
      col("user_id") === col("c_custkey"))

  val enrichedSegmentsSql: String =
    """SELECT c_mktsegment AS segment, event_type, count(*) AS n,
      |  round(sum(value), 2) AS val
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY segment, event_type""".stripMargin
}
