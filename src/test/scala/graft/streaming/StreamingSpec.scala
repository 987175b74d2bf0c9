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

  test("stream-static enrichment join equals the batch join (append mode)") {
    val dir = Files.createTempDirectory("graft-enrich").toString + "/events"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(dir)
    val dim = Tables.customer(spark, sf)

    val src = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val q = EventWindows.enrichJoin(src, dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_out")
    val batch = EventWindows.enrichJoin(ev, dim)

    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("watermark drops late data across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString + "/events"
    def mkEvents(rows: Seq[(Long, String, Long, String, Double, String)]) =
      rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    // batch 1: events at 10:00 and 11:00 → watermark advances to 10:50
    mkEvents(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 11:00:00", 1L, "click", 1.0, "{}")))
      .write.parquet(dir)

    val src = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: an event at 09:30, an hour behind the watermark → dropped;
      // plus one at 11:30 keeping the query moving
      mkEvents(Seq(
        (3L, "2024-01-01 09:30:00", 1L, "click", 1.0, "{}"),
        (4L, "2024-01-01 11:30:00", 1L, "click", 1.0, "{}")))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      // batch 3: push watermark far ahead so all closable windows emit
      mkEvents(Seq((5L, "2024-01-01 15:00:00", 1L, "click", 1.0, "{}")))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000L
    // the 09:00 window was NEVER created (event 3 arrived after the
    // watermark passed it) and the 10:00 window holds only event 1
    assert(!out.contains(us("2024-01-01 09:00:00")), s"late event leaked: $out")
    assert(out(us("2024-01-01 10:00:00")) === 1L)
    assert(out(us("2024-01-01 11:00:00")) === 2L)
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

  test("streaming restart from checkpoint neither drops nor duplicates") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-ckpt").toString
    val dir = root + "/events"
    val ckpt = root + "/checkpoint"
    val ev = Tables.events(spark, sf)
    // first half of the stream, then a planned stop
    ev.filter(col("event_id") % 2 === 0).write.parquet(dir)

    def start() = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("ckpt_out").start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // second half arrives while the query is DOWN; restart resumes from
    // the checkpointed source offsets — every file counted exactly once
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.table("ckpt_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-ssj").toString + "/events"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(dir)

    val c = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val f = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val q = StatefulOps.streamIntervalJoin(c, f)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssj_out")

    // batch equivalent of the same join (q21's shape, pre-aggregation)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val follow = ev.select(col("user_id").as("fu"), col("ts").as("fts"),
      col("event_type").as("ftype"))
    val batch = clicks.join(follow,
      col("cu") === col("fu") && col("fts") > col("cts") &&
        col("fts") <= col("cts") + expr("INTERVAL 5 MINUTES"))

    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("outer interval join flushes unmatched clicks after the watermark passes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ssjo").toString + "/events"
    val ev = Tables.events(spark, sf)
    ev.write.parquet(dir)

    val c = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val f = spark.readStream.schema(EventWindows.eventsSchema).parquet(dir)
    val q = StatefulOps.streamIntervalJoinOuter(c, f)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjo_out").start()
    try {
      q.processAllAvailable()
      // unmatched rows are held in state until the watermark proves no
      // match can come: append a far-future sentinel as a SECOND batch
      // so the next micro-batch's watermark evicts and null-extends them
      val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
      Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 3600L * 1000), -1L,
        "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssjo_out").filter(col("cu") =!= -1L)

    val batch = StatefulOps.streamIntervalJoinOuter(ev, ev)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // and the outer join genuinely adds null-extended rows
    assert(streamed.filter(col("fts").isNull).count() > 0,
      "no unmatched clicks flushed — watermark never advanced")
  }

  test("session funnel counts conversions only when a purchase follows the first click") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mk = Seq(
      // user 1, session A: click then purchase -> converted
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:05:00", 1L, "purchase", 9.0, "{}"),
      // user 1, session B (>=10 min gap): purchase BEFORE its only click
      (3L, "2024-01-01 11:00:00", 1L, "purchase", 5.0, "{}"),
      (4L, "2024-01-01 11:05:00", 1L, "click", 1.0, "{}"),
      // user 2: view-only session
      (5L, "2024-01-01 09:00:00", 2L, "view", 1.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val r = EventWindows.sessionFunnel(mk).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 2L, 2L, 1L)))
  }

  test("ohlc bars pick open/close by event time with id tie-break; stream == batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mk = Seq(
      (1L, "2024-01-01 10:05:00", 1L, "t", 5.0, "{}"),
      (2L, "2024-01-01 10:30:00", 1L, "t", 1.0, "{}"),
      (3L, "2024-01-01 10:30:00", 1L, "t", 7.0, "{}"), // same ts: id orders it
      (4L, "2024-01-01 10:45:00", 1L, "t", 9.0, "{}"),
      (5L, "2024-01-01 11:10:00", 1L, "t", 2.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val out = EventWindows.ohlcBars(mk).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    // hour 10: open = 5.0 (10:05), close = 9.0 (10:45), low 1, high 9, n 4
    assert(out(0) === (("t", 5.0, 9.0, 1.0, 9.0, 4L)))
    assert(out(1) === (("t", 2.0, 2.0, 2.0, 2.0, 1L)))

    // the identical plan incrementalizes: memory-sink stream == batch
    val dir = java.nio.file.Files.createTempDirectory("graft-ohlc").toString + "/events"
    val ev = graft.Tables.events(spark, sf)
    ev.write.parquet(dir)
    val streamed = EventWindows.runStreaming(spark, dir, "ohlc_out",
      df => EventWindows.ohlcBars(df))
    val batch = EventWindows.ohlcBars(ev)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming fp-index ingest (foreachBatch read-modify-write) equals " +
    "the one-shot q176 batch update (r9 judge Next #5)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // batch expected: gen0 (even docs, fp-deduped) + ONE batch holding
    // every odd doc — exactly the q176 read-modify-write
    val rootB = Files.createTempDirectory("graft-fpbatch").toString
    graft.llm.Corpus.writeFpGen0(docs, rootB)
    graft.llm.Corpus.fpIndexStreamBatch(rootB)(
      docs.filter(col("doc_id") % 2 === 1), 0L)
    val expected = spark.read.parquet(s"$rootB/gen1")

    // streaming side: the same odd docs arrive as TWO doc_id-ascending
    // micro-batches (ascending order is the stream≡batch precondition:
    // min doc_id per novel fp must arrive no later than its duplicates)
    val rootS = Files.createTempDirectory("graft-fpstream").toString
    graft.llm.Corpus.writeFpGen0(docs, rootS)
    val dir = Files.createTempDirectory("graft-fpsrc").toString + "/docs"
    val median = docs.count() / 2
    docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < median)
      .write.parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Corpus.fpIndexStreamBatch(rootS)(b, id))
      .start()
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") >= median)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val gens = new java.io.File(rootS).list().count(_.startsWith("gen"))
    val streamed = spark.read.parquet(s"$rootS/gen${gens - 1}")
    assert(gens >= 3, "stream never advanced a generation")
    assert(streamed.count() === expected.count())
    assert(streamed.except(expected).isEmpty &&
      expected.except(streamed).isEmpty)
  }

  test("stored-index IVF search on a probe STREAM equals the batch serve " +
    "(q175 online; r8 judge Next #7)") {
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-annserve").toString + "/probes"
    emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // one tag → one stored index, shared by the stream and batch sides:
    // both serve from the SAME parquet tables, so equality is bit-exact
    val tag = s"stream-spec-$sf"
    val src = spark.readStream.schema(schema).parquet(dir)
    val q = graft.llm.Similarity.ivfSearchStream(src, emb, tag)
      .writeStream.outputMode("update")
      .format("memory").queryName("ann_serve_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ann_serve_out")
    val batch = graft.llm.Similarity.ivfTopKServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("IVF-PQ hybrid serve on a probe STREAM equals the batch serve " +
    "(q187 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-ivfpqsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-ivfpqout").toString + "/res"
    // the batch leg's probe set (vec_id < 10) arrives as TWO
    // micro-batches; per-probe results depend only on the probe row +
    // the shared stored root, so the union must be bit-identical
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"ivfpq-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.ivfPqStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.ivfPqServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("composed-index INGEST stream (q190 online): generations merged " +
    "from arrival micro-batches equal the batch lifecycle's chain") {
    import org.apache.spark.sql.functions.{col, floor}
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    // batch reference: the full lifecycle chain (deterministic kernels,
    // so a second run over the same corpus rebuilds it bit-for-bit)
    val rootB = Files.createTempDirectory("graft-ivfpq-ingb").toString
    val rootS = Files.createTempDirectory("graft-ivfpq-ings").toString
    val dir = Files.createTempDirectory("graft-ivfpq-arr").toString + "/arr"
    try {
      graft.llm.Similarity.ivfPqLifecycleTo(emb, rootB)
      // streamed side: same frozen tables + gen0 seed, generations
      // 1 and 2 arrive as micro-batches instead
      graft.llm.Similarity.ivfPqLifecycleTo(emb, rootS)
      for (g <- 1 to 3)
        graft.FsUtil.deleteRecursively(new java.io.File(s"$rootS/gen$g"))
      def arrivals(g: Int) = emb
        .filter(col("vec_id") % 4 === g)
        .select(floor(col("vec_id") / 4).cast("long").as("ent"),
          col("vec_id"), col("embedding"),
          (col("vec_id") % 7 === 0).as("del"))
      arrivals(1).write.parquet(dir)
      val schema = StructType(Seq(
        StructField("ent", LongType), StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.llm.Similarity.ivfPqIngestStreamBatch(rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        arrivals(2).write.mode("append").parquet(dir)
        q.processAllAvailable()
      } finally q.stop()
      for (g <- 1 to 2) {
        val b = spark.read.parquet(s"$rootB/gen$g")
        val s = spark.read.parquet(s"$rootS/gen$g")
        assert(s.count() === b.count(), s"gen$g row count diverged")
        assert(s.except(b).isEmpty && b.except(s).isEmpty,
          s"gen$g streamed != batch")
      }
    } finally Seq(rootB, rootS).foreach(r =>
      graft.FsUtil.deleteRecursively(new java.io.File(r)))
  }

  test("COMPOSED LSM view serve on a probe STREAM equals the batch serve " +
    "(q198 online)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-lsmcsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-lsmcout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"lsmc-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.lsmComposedServeStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.lsmComposedServeSplit(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("fuzzy match on a dirty-record STREAM equals the batch serve " +
    "(q200 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val docs = graft.Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft-fzsrc").toString + "/dirty"
    val out = Files.createTempDirectory("graft-fzout").toString + "/res"
    // the q199 fixture's dirty keys, arriving as TWO micro-batches
    def dirtyOf(pred: org.apache.spark.sql.Column) = docs.filter(pred)
      .select(col("doc_id").as("d_id"),
        expr("substring(text, 1, 40)").as("ckey"))
      .withColumn("pos", (col("d_id") % length(col("ckey"))).cast("int"))
      .select(col("d_id"),
        concat(expr("substring(ckey, 1, pos)"),
          expr("substring(ckey, pos + 2, 1000)")).as("dkey"))
    dirtyOf(col("doc_id") % 2 === 0).write.parquet(dir)
    val schema = StructType(Seq(
      StructField("d_id", LongType), StructField("dkey", StringType)))
    val tag = s"fz-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Dedup.fuzzyMatchStreamBatch(docs, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      dirtyOf(col("doc_id") % 2 === 1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Dedup.fuzzyJoinServed(docs, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("COMPOSED LSM ingest stream (q196 online): composed delta appends " +
    "+ triggered compaction from micro-batches equal the batch store") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val rootB = Files.createTempDirectory("graft-lsmc-ingb").toString
    val rootS = Files.createTempDirectory("graft-lsmc-ings").toString
    val dir = Files.createTempDirectory("graft-lsmc-arr").toString + "/arr"
    try {
      graft.llm.Similarity.lsmComposedIndexTo(emb, rootB)
      graft.llm.Similarity.lsmComposedIndexTo(emb, rootS)
      graft.FsUtil.deleteRecursively(new java.io.File(s"$rootS/base_c3"))
      def arrivals(g: Int) = emb
        .filter(col("vec_id") % 100 === g || col("vec_id") % 100 === 4)
        .select(col("vec_id").as("ent"), col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long") +
              lit(500L * g)).as("qe"),
          col("label"), (col("vec_id") % 3 === 0).as("del"))
      arrivals(1).write.parquet(dir)
      val schema = StructType(Seq(
        StructField("ent", LongType), StructField("vec_id", LongType),
        StructField("qe", ArrayType(LongType)),
        StructField("label", IntegerType),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.llm.Similarity.lsmComposedIngestStreamBatch(rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        arrivals(2).write.mode("append").parquet(dir)
        q.processAllAvailable()
        assert(new java.io.File(s"$rootS/delta1").exists() &&
          new java.io.File(s"$rootS/delta2").exists())
        arrivals(3).write.mode("append").parquet(dir)
        q.processAllAvailable()
      } finally q.stop()
      assert(!new java.io.File(s"$rootS/delta1").exists(),
        "compaction did not clear the composed delta segments")
      def comp(root: String) = spark.read.parquet(s"$root/base_c3")
        .select(col("ent"), col("vec_id"),
          col("cluster").cast("long").as("cluster"), col("dist"),
          // positional checksums — arrays compare awkwardly under
          // except, weighted scalars pin them just as hard; qe is the
          // column the q197/q198 refine reads, so it must be pinned too
          aggregate(zip_with(col("cws"),
              sequence(lit(1L), lit(16L)), (c, i) => c * i),
            lit(0L), (s, x) => s + x).as("cwsum"),
          aggregate(zip_with(col("qe"),
              sequence(lit(1L), lit(64L)), (c, i) => c * i),
            lit(0L), (s, x) => s + x).as("qesum"))
      val (compS, compB) = (comp(rootS), comp(rootB))
      assert(compS.count() === compB.count())
      assert(compS.except(compB).isEmpty && compB.except(compS).isEmpty,
        "streamed compacted composed store != batch lifecycle's")
    } finally Seq(rootB, rootS).foreach(r =>
      graft.FsUtil.deleteRecursively(new java.io.File(r)))
  }

  test("LSM view serve on a probe STREAM equals the batch serve " +
    "(q195 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-lsmsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-lsmout").toString + "/res"
    // the batch leg's probe set (vec_id < 10) arrives as TWO
    // micro-batches over the SAME ServedRoots store (one tag)
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"lsm-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.lsmServeStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.lsmServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("FILTERED ANN serve on a probe STREAM equals the batch serve " +
    "(q207 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-fltsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-fltout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"flt-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.filteredSearchStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.ivfTopKFilteredServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    // the stream answered only filter-eligible neighbors
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(streamed.join(labels, "neighbor_id")
      .filter(col("label") % 2 =!= 0).isEmpty)
  }

  test("MaxSim RERANK serve on a probe STREAM equals the batch serve " +
    "(q209 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-mxssrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-mxsout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"mxs-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.maxSimRerankStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.maxSimRerankServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("LSM INGEST stream (q193 online): delta appends + triggered " +
    "compaction from micro-batches equal the batch lifecycle's store") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val rootB = Files.createTempDirectory("graft-lsm-ingb").toString
    val rootS = Files.createTempDirectory("graft-lsm-ings").toString
    val dir = Files.createTempDirectory("graft-lsm-arr").toString + "/arr"
    try {
      // batch reference: full lifecycle (ends compacted into base_c3)
      graft.llm.Similarity.lsmVectorIndexTo(emb, rootB)
      // streamed side: deterministic rebuild, then strip everything but
      // the seed (centroids + the gen-0 base segment)
      graft.llm.Similarity.lsmVectorIndexTo(emb, rootS)
      graft.FsUtil.deleteRecursively(new java.io.File(s"$rootS/base_c3"))
      // the q193 fixture's arrival bands, pre-quantized and drifted in
      // the integer domain (the stream leg's contract)
      def arrivals(g: Int) = emb
        .filter(col("vec_id") % 100 === g || col("vec_id") % 100 === 4)
        .select(col("vec_id").as("ent"), col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long") +
              lit(500L * g)).as("qe"),
          col("label"), (col("vec_id") % 3 === 0).as("del"))
      def baseFiles(): Set[String] =
        Option(new java.io.File(s"$rootS/base").listFiles()).toSeq.flatten
          .map(f => s"${f.getName}:${f.lastModified}").toSet
      val seedFiles = baseFiles()
      arrivals(1).write.parquet(dir)
      val schema = StructType(Seq(
        StructField("ent", LongType), StructField("vec_id", LongType),
        StructField("qe", ArrayType(LongType)),
        StructField("label", IntegerType),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.llm.Similarity.lsmIngestStreamBatch(rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        arrivals(2).write.mode("append").parquet(dir)
        q.processAllAvailable()
        // two non-compacting micro-batches: deltas exist, base untouched
        assert(new java.io.File(s"$rootS/delta1").exists())
        assert(new java.io.File(s"$rootS/delta2").exists())
        assert(baseFiles() === seedFiles,
          "a streamed delta batch rewrote the base segment")
        arrivals(3).write.mode("append").parquet(dir)
        q.processAllAvailable()
      } finally q.stop()
      // third batch crossed 5%: compacted, deltas cleared
      assert(!new java.io.File(s"$rootS/delta1").exists() &&
        !new java.io.File(s"$rootS/delta3").exists(),
        "compaction did not clear the delta segments")
      val compS = spark.read.parquet(s"$rootS/base_c3")
        .select(col("ent"), col("vec_id"),
          col("cluster").cast("long").as("cluster"), col("dist"))
      val compB = spark.read.parquet(s"$rootB/base_c3")
        .select(col("ent"), col("vec_id"),
          col("cluster").cast("long").as("cluster"), col("dist"))
      assert(compS.count() === compB.count())
      assert(compS.except(compB).isEmpty && compB.except(compS).isEmpty,
        "streamed compacted store != batch lifecycle's")
    } finally Seq(rootB, rootS).foreach(r =>
      graft.FsUtil.deleteRecursively(new java.io.File(r)))
  }
  test("graph-ANN serve on a probe STREAM equals the batch serve " +
    "(q203 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-gannsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-gannout").toString + "/res"
    // the batch leg's probe set (vec_id < 10) arrives as TWO
    // micro-batches; per-probe results depend only on the probe row +
    // the shared stored graph, so the union must be bit-identical
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"gann-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.GraphAnn.graphSearchStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.GraphAnn.beamTopKServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("FILTERED graph serve on a probe STREAM equals the batch serve " +
    "(q220 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-fgsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-fgout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"gann-fstream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.GraphAnn.filteredGraphStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.GraphAnn.beamTopKFilteredServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("SQ8 serve on a probe STREAM equals the batch serve " +
    "(q215 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-sq8src").toString + "/probes"
    val out = Files.createTempDirectory("graft-sq8out").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"sq8-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.sq8SearchStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.sq8TopKServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("IVF-SQ8 composed serve on a probe STREAM equals the batch " +
    "serve (q217 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-isq8src").toString + "/probes"
    val out = Files.createTempDirectory("graft-isq8out").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"isq8-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.ivfSq8StreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.ivfSq8Served(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("FILTERED IVF-SQ8 serve on a probe STREAM equals the batch " +
    "serve (q223 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-fsq8src").toString + "/probes"
    val out = Files.createTempDirectory("graft-fsq8out").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"isq8-stream-$sf" // the q217 store serves the filtered leg
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.ivfSq8FilteredStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.ivfSq8FilteredServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("FILTERED LSM serve on a probe STREAM equals the batch serve " +
    "(q228 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-flsmsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-flsmout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"flsm-stream-$sf" // the q195 store serves the filtered leg
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.lsmFilteredServeStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.lsmFilteredServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("SQ8-lifecycle ingest on an arrival STREAM equals the batch " +
    "lifecycle's final store state bit-for-bit (q225 online)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val rootB = Files.createTempDirectory("graft-sq8lcb").toString
    val rootS = Files.createTempDirectory("graft-sq8lcs").toString
    val dir = Files.createTempDirectory("graft-sq8arr").toString + "/arr"
    try {
      // batch reference: the full q225 chain
      graft.llm.Similarity.sq8LifecycleTo(emb, rootB)
      // streamed: same seed, then the three arrival bands as ORDERED
      // micro-batches through the foreachBatch ingest
      graft.llm.Similarity.sq8SeedTo(emb, rootS)
      val band = emb.select(
        org.apache.spark.sql.functions.floor(col("vec_id") / 4)
          .cast("long").as("ent"),
        col("vec_id"), (col("vec_id") % 4).as("b"),
        col("embedding"), (col("vec_id") % 7 === 0).as("del"))
      band.filter(col("b") === 1)
        .select("ent", "vec_id", "embedding", "del").write.parquet(dir)
      val schema = StructType(Seq(
        StructField("ent", LongType), StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.llm.Similarity.sq8IngestStreamBatch(rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        for (g <- 2 to 3) {
          band.filter(col("b") === g)
            .select("ent", "vec_id", "embedding", "del")
            .write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      } finally q.stop()
      val fin = spark.read.parquet(s"$rootB/gen3")
      val finS = spark.read.parquet(s"$rootS/gen3")
      assert(finS.count() === fin.count())
      assert(finS.except(fin).isEmpty && fin.except(finS).isEmpty)
    } finally {
      graft.FsUtil.deleteRecursively(new java.io.File(rootB))
      graft.FsUtil.deleteRecursively(new java.io.File(rootS))
    }
  }

  test("binary-tier serve on a probe STREAM equals the batch serve " +
    "(q238 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-bqsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-bqout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"bq-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.bqSearchStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.bqServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("SQ8 LSM serve on a probe STREAM equals the batch serve " +
    "(q233 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-sq8lsmsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-sq8lsmout").toString + "/res"
    emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val tag = s"sq8lsm-stream-$sf"
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.Similarity.sq8LsmServeStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
        .select("vec_id", "embedding").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.Similarity.sq8LsmServed(emb, tag)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("SQ8 LSM ingest on an arrival STREAM equals the batch " +
    "lifecycle's compacted store bit-for-bit (q232 online)") {
    import org.apache.spark.sql.functions.{col, lit, transform}
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val rootB = Files.createTempDirectory("graft-sq8lsmb").toString
    val rootS = Files.createTempDirectory("graft-sq8lsms").toString
    val dir = Files.createTempDirectory("graft-sq8lsmarr").toString + "/arr"
    try {
      // batch reference: full lifecycle (ends compacted into base_c3)
      graft.llm.Similarity.sq8LsmIndexTo(emb, rootB)
      // streamed side: deterministic rebuild, then strip everything but
      // the seed (centroids + the gen-0 packed base; the lifecycle
      // already cleared its deltas at compaction)
      graft.llm.Similarity.sq8LsmIndexTo(emb, rootS)
      graft.FsUtil.deleteRecursively(new java.io.File(s"$rootS/base_c3"))
      // the q232 fixture's arrival bands — FLOAT embeddings drifted
      // +0.5·g per coordinate (the stream leg's contract: the pack owns
      // float→byte and is per-row deterministic)
      def arrivals(g: Int) = emb
        .filter(col("vec_id") % 100 === g || col("vec_id") % 100 === 4)
        .select(col("vec_id").as("ent"), col("vec_id"),
          transform(col("embedding"), x => x + lit(0.5f * g))
            .as("embedding"),
          col("label"), (col("vec_id") % 3 === 0).as("del"))
      def baseFiles(): Set[String] =
        Option(new java.io.File(s"$rootS/base").listFiles()).toSeq.flatten
          .map(f => s"${f.getName}:${f.lastModified}").toSet
      val seedFiles = baseFiles()
      arrivals(1).write.parquet(dir)
      val schema = StructType(Seq(
        StructField("ent", LongType), StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.llm.Similarity.sq8LsmIngestStreamBatch(rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        arrivals(2).write.mode("append").parquet(dir)
        q.processAllAvailable()
        // two non-compacting micro-batches: deltas exist, base untouched
        assert(new java.io.File(s"$rootS/delta1").exists())
        assert(new java.io.File(s"$rootS/delta2").exists())
        assert(baseFiles() === seedFiles,
          "a streamed delta batch rewrote the packed base segment")
        arrivals(3).write.mode("append").parquet(dir)
        q.processAllAvailable()
      } finally q.stop()
      // third batch crossed 5%: compacted, deltas cleared
      assert(!new java.io.File(s"$rootS/delta1").exists() &&
        !new java.io.File(s"$rootS/delta3").exists(),
        "compaction did not clear the delta segments")
      def comp(root: String) = spark.read.parquet(s"$root/base_c3")
        .select(col("ent"), col("vec_id"), col("b8"), col("nsq"),
          col("cluster").cast("long").as("cluster"), col("dist"))
      val (compS, compB) = (comp(rootS), comp(rootB))
      assert(compS.count() === compB.count())
      assert(compS.except(compB).isEmpty && compB.except(compS).isEmpty,
        "streamed compacted packed store != batch lifecycle's")
    } finally Seq(rootB, rootS).foreach(r =>
      graft.FsUtil.deleteRecursively(new java.io.File(r)))
  }

  test("graph-LIFECYCLE serve on a probe STREAM equals the batch serve " +
    "(q211 online; union of foreachBatch micro-batches == one batch)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft-gannlcsrc").toString + "/probes"
    val out = Files.createTempDirectory("graft-gannlcout").toString + "/res"
    val tag = s"gannlc-stream-$sf"
    // the batch leg's FINAL-state probes (live vec_id < 10, drifted
    // quantized vectors) arrive as TWO micro-batches against the
    // shared served lifecycle store
    val probes = graft.llm.GraphLifecycle.servedFinalProbes(emb, tag)
      .localCheckpoint()
    probes.filter(col("vec_id") < 5).write.parquet(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("qe", ArrayType(LongType))))
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.llm.GraphLifecycle
          .graphLifecycleServeStreamBatch(emb, tag, out)(b, id))
      .start()
    try {
      q.processAllAvailable()
      probes.filter(col("vec_id") >= 5).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.llm.GraphLifecycle.graphLifecycleServed(emb, tag)
      .filter(col("state") === "g3c")
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
