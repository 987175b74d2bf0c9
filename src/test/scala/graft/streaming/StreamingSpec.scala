package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals the batch plan") {
    // materialize events with micros timestamps so readStream can use a
    // fixed schema (the raw fixture is TIMESTAMP(NANOS))
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(dir)

    val streamed = EventWindows.runStreaming(spark, dir, "tumbling_out",
      df => EventWindows.tumbling(df))
    val batch = EventWindows.tumbling(ev)

    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming session window equals the batch plan") {
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(dir)
    val streamed = EventWindows.runStreaming(spark, dir, "session_out",
      df => EventWindows.sessions(df))
    val batch = EventWindows.sessions(ev)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
