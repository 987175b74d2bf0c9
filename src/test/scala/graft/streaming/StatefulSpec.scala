package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class StatefulSpec extends SparkSpec {

  private def eventsDir(): String = {
    val dir = Files.createTempDirectory("graft-stateful").toString + "/events"
    Tables.events(spark, sf).write.parquet(dir)
    dir
  }

  test("streaming dedup-within-watermark matches batch distinct key count") {
    val dir = eventsDir()
    val streamed = StatefulOps.runAppendStreaming(spark, dir, "dedup_out",
      StatefulOps.dedupWithinWatermark)
    val batchKeys = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct().count()
    // one batch, all data within one watermark epoch ⇒ exact dedup
    assert(streamed.count() === batchKeys)
    assert(streamed.select(col("user_id"), col("event_type")).distinct().count() === batchKeys)
  }

  test("mapGroupsWithState running totals equal batch groupBy") {
    val dir = eventsDir()
    val streamed = StatefulOps.runUpdateStreaming(spark, dir, "totals_out",
      StatefulOps.runningUserTotals)
    val batch = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val s = streamed.select(col("user_id"), col("n"),
      round(col("total"), 6).as("total"))
    val b = batch.select(col("user_id"), col("n"),
      round(col("total"), 6).as("total"))
    assert(s.except(b).isEmpty && b.except(s).isEmpty)
  }

  test("transformWithState running spend equals batch groupBy (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = eventsDir()
      val streamed = StatefulOps.runUpdateStreaming(spark, dir, "spend_out",
        StatefulOps.runningUserSpend)
        .select(col("user_id"), col("n"), col("total_c"), col("max_c"))
      val batch = StatefulOps.userSpendBatch(Tables.events(spark, sf))
        .select(col("user_id"), col("n"), col("total_c"), col("max_c"))
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("metrics observer records stages and exposes a DataFrame") {
    val obs = graft.etl.MetricsObserver.install(spark)
    Tables.lineitem(spark, sf).groupBy("l_returnflag").count().collect()
    // listener bus is async; give it a beat
    Thread.sleep(500)
    assert(obs.jobCount >= 1)
    val df = obs.toDF(spark)
    assert(df.columns.toSet ===
      Set("stageId", "tasks", "inputBytes", "inputRecords", "shuffleWriteBytes", "elapsedMs"))
    assert(df.count() >= 1)
  }

  test("TableIO format seam: parquet -> csv -> json roundtrip") {
    import graft.sources.TableIO
    val base = Files.createTempDirectory("graft-io").toString
    val src = Tables.nation(spark, sf)
    TableIO.save(src, "csv", s"$base/n_csv", Map("header" -> "true"))
    val csv = TableIO.load(spark, "csv", s"$base/n_csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(csv.count() === src.count())
    TableIO.save(csv, "json", s"$base/n_json")
    val json = TableIO.load(spark, "json", s"$base/n_json")
    assert(json.count() === src.count())
    assert(json.select("n_name").distinct().count() ===
      src.select("n_name").distinct().count())
  }
}
