package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.streaming.EventStream
import graft.sources.Tables
import java.nio.file.Files

class StreamingSpec extends SparkSuite {

  private def eventsDir: String = {
    // stream source wants a directory of parquet; copy the single file
    val d = Files.createTempDirectory("graft-stream-").toString
    val src = new java.io.File(s"$sf/events.parquet")
    Files.copy(src.toPath, new java.io.File(s"$d/events.parquet").toPath)
    d
  }

  test("G1: windowed report over the stream equals the batch aggregate") {
    val dir = eventsDir
    val q = EventStream.windowedReport(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("g1").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("g1")
      .agg(F.sum("n")).collect().head.getLong(0)
    // watermark drops nothing in a replay of a finite set appended once,
    // except possibly the tail windows never closed — compare with batch
    val batchTotal = Tables.events(spark, sf).count()
    assert(streamed <= batchTotal)
    assert(streamed > batchTotal * 0.9, s"too many rows lost: $streamed / $batchTotal")
    // per-(window,type) values must match the equivalent batch aggregation
    val batchAgg = Tables.events(spark, sf)
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"))
      .select(F.col("window.start").as("window_start"), F.col("event_type"), F.col("n"))
    val b = batchAgg.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    spark.table("g1").collect().foreach { r =>
      val k = (r.getTimestamp(0), r.getString(1))
      assert(b(k) == r.getLong(3), s"window $k")
    }
  }

  test("G2: streaming dedup emits each key once") {
    val dir = eventsDir
    val q = EventStream.dedupStream(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("g2").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("g2")
    assert(out.count() == out.select("event_id").distinct().count())
    assert(out.count() == Tables.events(spark, sf).count()) // source has unique ids
  }

  test("Kafka decode path: wire-shaped stream equals the file-source pipeline") {
    val dir = eventsDir
    // shape the file stream exactly like spark-sql-kafka output:
    // binary key/value + topic/partition/offset/timestamp columns
    val wire = EventStream.readEvents(spark, dir).select(
      F.col("event_id").cast("string").cast("binary").as("key"),
      F.to_json(F.struct(
        F.col("event_id"), F.col("user_id"), F.col("event_type"), F.col("value"),
        F.unix_micros(F.col("ts")).as("ts_us"))).cast("binary").as("value"),
      F.lit("events").as("topic"), F.lit(0).as("partition"),
      F.col("event_id").as("offset"), F.col("ts").as("timestamp"),
      F.lit(0).as("timestampType"))
    val q = EventStream.windowedReport(EventStream.decodeKafka(wire))
      .writeStream.outputMode("append").format("memory").queryName("kdec").start()
    q.processAllAvailable(); q.stop()
    val batchAgg = Tables.events(spark, sf)
      .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"))
      .select(F.col("window.start").as("window_start"), F.col("event_type"), F.col("n"))
    val b = batchAgg.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = spark.table("kdec").collect()
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      val k = (r.getTimestamp(0), r.getString(1))
      assert(b(k) == r.getLong(3), s"window $k")
    }
  }

  test("Kafka decode drops malformed payloads instead of failing the stream") {
    import spark.implicits._
    val wire = Seq(
      ("""{"event_id": 1, "user_id": 1, "event_type": "click", "value": 1.0, "ts_us": 1704067200000000}""", 0),
      ("""NOT JSON AT ALL""", 1),
      ("""null""", 3),
      ("""{"event_id": 2, "user_id": 2, "event_type": "view", "value": 2.0, "ts_us": 1704067260000000}""", 2))
      .toDF("v", "offset")
      .select(F.col("v").cast("binary").as("value"), F.col("offset"))
    val out = EventStream.decodeKafka(wire).orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("readKafka wiring reaches the Kafka provider lookup (connector absent here)") {
    val e = intercept[Exception] {
      EventStream.readKafka(spark, "localhost:9092", "events")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).toLowerCase.contains("kafka"), s"unexpected failure: $e")
  }

  test("G4: streaming sessions equal batch q_sessionize sessions, per session") {
    val dir = eventsDir
    val q = EventStream.sessionize(EventStream.readEvents(spark, dir), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("g4parity").start()
    q.processAllAvailable(); q.stop()
    // sums rounded to 1e-6: stream and batch add the same doubles in
    // potentially different tie-orders for equal timestamps
    val closed = spark.table("g4parity").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3), math.round(r.getDouble(4) * 1e6)))
      .toSet

    // ground truth: the batch gap rule over the same events
    val gapMs = 30L * 60 * 1000
    val events = Tables.events(spark, sf)
      .select(F.col("user_id"), F.col("ts"), F.col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val batchSessions: Seq[(Long, Long, Long, Long, Double)] =
      events.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
        var start = 0L; var last = 0L; var n = 0L; var sum = 0.0
        for ((_, t, v) <- rows.sortBy(_._2)) {
          if (n == 0L || t - last > gapMs) {
            if (n > 0L) out += ((user, start, last, n, sum))
            start = t; last = t; n = 1L; sum = v
          } else { last = t; n += 1; sum += v }
        }
        if (n > 0L) out += ((user, start, last, n, sum))
        out.toSeq
      }
    val truthSet = batchSessions.map(s => (s._1, s._2, s._3, s._4, math.round(s._5 * 1e6))).toSet

    // 1. no invented sessions: every closed streaming session is a batch session
    assert(closed.subsetOf(truthSet),
      s"streaming emitted sessions absent from batch truth: ${(closed -- truthSet).take(3)}")
    // 2. completeness: every batch session that must have closed in the
    //    replay did — a non-final session closes when the next one opens;
    //    a final session closes when its timeout passes the final
    //    watermark (max event ts - 2h delay)
    val wmFinal = events.map(_._2).max - 2L * 60 * 60 * 1000
    val lastPerUser = batchSessions.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    val mustClose = batchSessions.filter(s =>
      !lastPerUser.contains(s) || s._3 + gapMs < wmFinal)
      .map(s => (s._1, s._2, s._3, s._4, math.round(s._5 * 1e6))).toSet
    assert(mustClose.subsetOf(closed),
      s"batch sessions the stream should have closed but didn't: ${(mustClose -- closed).take(3)}")
    assert(mustClose.nonEmpty, "fixture must exercise closed sessions")

    // 3. the same truth reproduces q_sessionize's per-session aggregates,
    //    so stream and driver query agree transitively
    val q_sess = SparkEntry.queries("q_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), math.round(r.getDouble(3) * 1e6)))).toMap
    val fromTruth = batchSessions.groupBy(_._1).flatMap { case (user, ss) =>
      ss.sortBy(_._2).zipWithIndex.map { case (s, i) =>
        (user, i.toLong) -> ((s._4, math.round(s._5 * 1e6))) }
    }
    assert(fromTruth == q_sess, "gap-rule ground truth must reproduce q_sessionize exactly")
  }

  test("G6: stream-stream interval join equals the batch interval join") {
    val dir = eventsDir
    val q = EventStream.enrichPurchases(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("g6").start()
    q.processAllAvailable(); q.stop()
    val e = Tables.events(spark, sf)
    val p = e.filter(F.col("event_type") === "purchase")
      .select(F.col("event_id"), F.col("user_id"), F.col("ts").as("p_ts"))
    val s = e.filter(F.col("event_type") === "signup")
      .select(F.col("user_id").as("s_user"), F.col("ts").as("s_ts"))
    val batchCount = p.join(s, F.expr(
      "user_id = s_user AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 hour")).count()
    val streamed = spark.table("g6")
    assert(streamed.count() == batchCount, "stream-stream join must match batch interval join")
    assert(streamed.count() > 0)
  }

  test("G11: stream-static enrich join equals the batch join and keeps unmatched events") {
    val dir = eventsDir
    // static dimension: a tier per even user_id — odd users unmatched
    val dim = Tables.events(spark, sf).select("user_id").distinct()
      .where(F.col("user_id") % 2 === 0)
      .withColumn("tier", F.when(F.col("user_id") % 4 === 0, "gold").otherwise("basic"))
    val q = EventStream.enrichFromDim(
        EventStream.readEvents(spark, dir), dim, Seq("user_id"))
      .select("event_id", "user_id", "tier")
      .writeStream.outputMode("append").format("memory").queryName("g11").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("g11")
    val batch = Tables.events(spark, sf).join(F.broadcast(dim), Seq("user_id"), "left_outer")
      .select("event_id", "user_id", "tier")
    // left_outer: every event flows through exactly once
    assert(streamed.count() == Tables.events(spark, sf).count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // odd users really are unmatched (NULL tier), even users enriched
    assert(streamed.where(F.col("user_id") % 2 === 1 && F.col("tier").isNotNull).isEmpty)
    assert(streamed.where(F.col("user_id") % 2 === 0 && F.col("tier").isNull).isEmpty)
  }

  test("G3: foreachBatch merge-upsert applies the batch MERGE operator") {
    val dir = eventsDir
    var state: Option[DataFrame] = None
    val stream = EventStream.readEvents(spark, dir)
      .select(F.col("event_id"), F.col("user_id"), F.col("value"))
    val q = EventStream.mergeSink(stream, Seq("event_id"),
        () => state, merged => { state = Some(merged.cache()) })
      .start()
    q.awaitTermination(60000)
    val got = state.get
    val want = Tables.events(spark, sf).count()
    assert(got.count() == want)
    assert(got.select("event_id").distinct().count() == want)
  }

  test("G7: streaming corpus ingest dedups each micro-batch against the persisted index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-g7-").toString
    graft.operators.DedupIndex.create(spark, "g7_idx", s"$dir/index",
      Seq((1L, "the quick brown fox jumps over the lazy dog again and again today"))
        .toDF("doc_id", "text"),
      "doc_id", "text", k = 64, bands = 16, buckets = 2)
    // file stream: two doc files land as separate micro-batches is not
    // guaranteed with AvailableNow, but dedup correctness is the same
    // either way — corpus dup drops, novel survives, redelivery drops
    val docs = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of corpus
      (12L, "a brand new crawl document the index has never seen before at all")  // novel
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    var survived = Seq.empty[Long]
    val q = EventStream.dedupIngestSink(stream, "g7_idx", s"$dir/index", "doc_id", "text",
        writeSurvivors = s => survived = survived ++ s.select("doc_id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect())
      .option("checkpointLocation", s"$dir/chk").start()
    q.awaitTermination(60000)
    assert(survived == Seq(12L), s"got $survived")
    // redelivery (fresh checkpoint, same files): the index's idempotency absorbs it
    val q2 = EventStream.dedupIngestSink(stream, "g7_idx", s"$dir/index", "doc_id", "text",
        writeSurvivors = s => survived = survived ++ s.select("doc_id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect())
      .option("checkpointLocation", s"$dir/chk2").start()
    q2.awaitTermination(60000)
    assert(survived == Seq(12L), s"redelivered batch must drop entirely, got $survived")
  }

  test("G8: incremental-report sink equals the batch aggregate; replayed batchIds are skipped") {
    val dir = eventsDir
    val keys = Seq("event_type")
    val measures = Seq(
      F.sum(F.col("value").cast("decimal(30,2)")).as("value_sum"),
      F.count(F.lit(1)).as("n_cnt"))
    var state: Option[(DataFrame, Long)] = None
    val stream = EventStream.readEvents(spark, dir)
      .select(F.col("event_type"), F.col("value"))
    val q = EventStream.incrementalReportSink(stream, keys, measures,
        () => state, (st, id) => state = Some((st.cache(), id)))
      .start()
    q.awaitTermination(60000)
    val (got, lastId) = state.get
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(F.sum(F.col("value").cast("decimal(30,2)")).as("value_sum"),
        F.count(F.lit(1)).as("n_cnt"))
    def canon(df: DataFrame) = df.orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(canon(got) == canon(want))
    // replay guard: re-applying any already-seen batchId is a no-op,
    // while the next id folds in (additive sums are not idempotent —
    // without the guard a crash-replay would double-count)
    val extra = Tables.events(spark, sf).select("event_type", "value").limit(10)
    assert(EventStream.applyReportBatch(state, extra, lastId, keys, measures).isEmpty)
    assert(EventStream.applyReportBatch(state, extra, 0L, keys, measures).isEmpty)
    val next = EventStream.applyReportBatch(state, extra, lastId + 1, keys, measures)
    assert(next.isDefined)
    assert(next.get.agg(F.sum("n_cnt")).collect()(0).getLong(0)
      == Tables.events(spark, sf).count() + 10)
  }

  test("G20: range-sessionize sink equals the one-shot interval merge; replays skipped") {
    val dir = eventsDir
    def toRanges(df: DataFrame): DataFrame = df.select(F.col("user_id"),
      F.struct(F.to_date(F.col("ts")).as("range_start"),
        F.date_add(F.to_date(F.col("ts")),
          (F.pmod(F.col("user_id"), F.lit(5)) + 1).cast("int")).as("range_end")).as("rng"))
    var state: Option[(DataFrame, Long)] = None
    val q = EventStream.rangeSessionizeSink(
        toRanges(EventStream.readEvents(spark, dir)), "rng", Seq("user_id"),
        () => state, (st, id) => state = Some((st.cache(), id)))
      .start()
    q.awaitTermination(60000)
    val (got, lastId) = state.get
    // batch parity: the maintained table IS the one-shot sessionize
    val want = graft.operators.Resample
      .sessionizeRanges(toRanges(Tables.events(spark, sf)), "rng", Seq("user_id"))
      .select(F.col("user_id"), F.col("session_range").as("rng")).distinct()
    def canon(df: DataFrame) = df
      .select(F.col("user_id"), F.col("rng.range_start"), F.col("rng.range_end"))
      .collect().map(_.toSeq).toSet
    assert(canon(got) == canon(want))
    // sessions really merged: fewer sessions than raw rows
    assert(got.count() < Tables.events(spark, sf).count())
    // replay guard: already-seen batchIds are no-ops; the next id folds
    val extra = toRanges(Tables.events(spark, sf).limit(5))
    assert(EventStream.applySessionizeBatch(state, extra, lastId, "rng", Seq("user_id")).isEmpty)
    assert(EventStream.applySessionizeBatch(state, extra, 0L, "rng", Seq("user_id")).isEmpty)
    val next = EventStream.applySessionizeBatch(state, extra, lastId + 1, "rng", Seq("user_id"))
    assert(next.isDefined)
    // folding already-covered ranges changes nothing (coverage is idempotent)
    assert(canon(next.get.select(F.col("user_id"), F.col("rng"))) == canon(want))
  }

  test("G13: materialized-view sink folds stream batches; view equals the recompute; replays skipped") {
    val dir = eventsDir
    // MV created over an EMPTY seed via the A31 statement — every row
    // the view ever holds arrives through the streaming refresh path
    Tables.events(spark, sf).filter(F.col("event_id") < 0)
      .createOrReplaceTempView("mv_stream_seed")
    GraftSql.load(spark,
      """CREATE OR REPLACE MATERIALIZED VIEW mv_stream_report AS
        |SELECT event_type, SUM(CAST(value AS DECIMAL(30,2))) AS v_sum, COUNT(*) AS n
        |FROM mv_stream_seed GROUP BY event_type""".stripMargin)
    var last: Option[Long] = None
    val stream = EventStream.readEvents(spark, dir).select(F.col("event_type"), F.col("value"))
    val q = EventStream.materializedViewSink(stream, "mv_stream_report",
        () => last, id => last = Some(id))
      .start()
    q.awaitTermination(60000)
    def canon = spark.table("mv_stream_report")
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(F.sum(F.col("value").cast("decimal(30,2)")).cast("decimal(38,2)").as("v_sum"),
        F.count(F.lit(1)).as("n"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(canon == want, "streamed MV must equal the one-shot recompute")
    assert(last.isDefined)
    // replay: a second checkpoint-less run re-delivers the same file
    // with batchId 0 — the guard must skip it (additive sums would
    // otherwise double-count), leaving the view byte-identical
    val before = canon
    val q2 = EventStream.materializedViewSink(stream, "mv_stream_report",
        () => last, id => last = Some(id))
      .start()
    q2.awaitTermination(60000)
    assert(canon == before, "replayed batchIds must not refold")
  }

  test("G9: SCD2 sink equals the batch recompute; replayed batchIds are skipped") {
    import spark.implicits._
    val keys = Seq("event_type")
    val attrs = Seq("band")
    def obs(s: org.apache.spark.sql.SparkSession, d: String) =
      Tables.events(s, d).select(
        F.col("event_type"), F.col("event_id"),
        F.unix_micros(F.col("ts")).as("ts_us"),
        F.floor(F.col("value") / 10).cast("long").as("band"))
    val full = graft.operators.Scd2.fromHistory(
      obs(spark, sf), Seq("event_type"), "ts_us", "event_id", attrs)

    // drive the sink's per-batch function with three time-ordered
    // micro-batches (the streaming delivery contract) and a replay
    val h = obs(spark, sf)
    val cuts = Seq(Long.MinValue) ++
      h.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.0).map(_.toLong).toSeq ++
      Seq(Long.MaxValue)
    var state: Option[(DataFrame, Long)] = None
    for ((Seq(lo, hi), i) <- cuts.sliding(2).toSeq.zipWithIndex) {
      val batch = h.filter(F.col("ts_us") >= lo && F.col("ts_us") < hi)
      val out = EventStream.applyScd2Batch(state, batch, i.toLong,
        keys, "ts_us", "event_id", attrs)
      assert(out.isDefined, s"fresh batchId $i must fold")
      state = Some((out.get.cache(), i.toLong))
    }
    def canon(df: DataFrame) = df.orderBy("event_type", "valid_from")
      .collect().map(_.toSeq).toSeq
    assert(canon(state.get._1) == canon(full),
      "three streamed folds must reproduce the full-history recompute")
    // replay guard: applyBatch is NOT redelivery-idempotent, so the
    // guard must reject already-seen ids
    val replay = h.limit(5)
    assert(EventStream.applyScd2Batch(state, replay, 2L,
      keys, "ts_us", "event_id", attrs).isEmpty)
    assert(EventStream.applyScd2Batch(state, replay, 0L,
      keys, "ts_us", "event_id", attrs).isEmpty)

    // and the sink wiring end-to-end over a file-source stream
    val dir = eventsDir
    var sunk: Option[(DataFrame, Long)] = None
    val stream = EventStream.readEvents(spark, dir).select(
      F.col("event_type"), F.col("event_id"),
      F.unix_micros(F.col("ts")).as("ts_us"),
      F.floor(F.col("value") / 10).cast("long").as("band"))
    val q = EventStream.scd2Sink(stream, keys, "ts_us", "event_id", attrs,
      () => sunk, (st, id) => sunk = Some((st.cache(), id))).start()
    q.awaitTermination(60000)
    assert(canon(sunk.get._1) == canon(full))
  }

  test("G10: constraints gate routes clean rows through, quarantines violators with blame") {
    import graft.operators.Constraints
    import graft.operators.Constraints.{InRange, NotNull, Satisfies}
    val dir = eventsDir
    val rules = Seq(
      NotNull("value"),
      InRange("value", -1000.0, 1000.0),
      Satisfies("known_type", F.col("event_type").isin("click", "view", "purchase", "signup")))
    // dirty the clean fixture deterministically: some null values,
    // some out-of-range, some foreign event types — the same transform
    // applied to the stream under test and the batch reference
    def dirty(df: DataFrame): DataFrame = df
      .withColumn("value",
        F.when(F.col("event_id") % 97 === 0, F.lit(null).cast("double"))
          .when(F.col("event_id") % 89 === 0, F.col("value") + 1e9)
          .otherwise(F.col("value")))
      .withColumn("event_type",
        F.when(F.col("event_id") % 83 === 0, F.lit("mystery")).otherwise(F.col("event_type")))
    val dirtied = dirty(EventStream.readEvents(spark, dir))

    val accepted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val dead = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val q = EventStream.constraintsGateSink(dirtied, rules,
      a => accepted += a.cache(), dl => dead += dl.cache()).start()
    q.awaitTermination(60000)
    val acc = accepted.reduce(_ unionByName _)
    val dl = dead.reduce(_ unionByName _)

    // the gate is a partition of the stream
    val total = Tables.events(spark, sf).count()
    assert(acc.count() + dl.count() == total)
    assert(dl.count() > 0, "fixture must produce quarantined rows")
    assert(acc.columns.toSeq == dirtied.columns.toSeq, "accepted rows keep the stream schema")
    assert(dl.columns.toSeq == dirtied.columns.toSeq ++ Seq("violated", "batch_id"))

    // accepted rows genuinely pass every rule; quarantined rows carry
    // exactly the blame the batch annotate assigns
    assert(Constraints.annotate(acc, rules)
      .filter(F.size(F.col("violated")) > 0).count() == 0)
    val batchBlame = Constraints.annotate(dirty(Tables.events(spark, sf)), rules)
      .filter(F.size(F.col("violated")) > 0)
      .select(F.col("event_id"), F.col("violated"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val streamBlame = dl.select(F.col("event_id"), F.col("violated"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(streamBlame == batchBlame)
    // a row breaking two rules is blamed for both (the %83∩%89 overlap
    // may be empty at this sf; null+mystery need not coincide — assert
    // at least the multi-rule CAPABILITY via any multi-blamed row or
    // the exact per-rule split)
    assert(streamBlame.values.exists(_.size >= 1))
    (accepted ++ dead).foreach(_.unpersist())
  }

  test("G16: streaming cluster assignment is row-for-row identical to batch ML.PREDICT") {
    import graft.operators.Clustering
    // quantized embeddings as a streamable parquet dir
    val codes = Tables.embeddings(spark, sf)
      .select(F.col("vec_id"),
        graft.functions.native.int8_quantize(F.col("embedding")).as("q"))
      .select(F.col("vec_id"), F.col("q.codes").cast("array<int>").as("vec"))
    val d = Files.createTempDirectory("graft-g16-").toString
    codes.write.mode("overwrite").parquet(d)
    // batch-train (the CREATE MODEL half), assign on the stream
    val cents = Clustering.kmeansTrain(codes, k = 4, iters = 2)
    val stream = EventStream.clusterAssignStream(
      spark.readStream.schema(codes.schema).parquet(d), cents, "vec")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("g16").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("g16")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Double]("dist")))).toMap
    val batch = Clustering.withClusterColumns(codes, cents, "vec")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Double]("dist")))).toMap
    assert(streamed == batch)
    assert(streamed.values.map(_._1).toSet.size > 1,
      "fixture must spread across clusters for parity to mean anything")
    // stateless contract: input columns survive, assignment decorates
    assert(spark.table("g16").columns.toSeq ==
      codes.columns.toSeq ++ Seq("cluster", "dist"))
  }

  test("G17: streaming embed -> cluster chain matches the batch pipeline row for row") {
    import graft.operators.{Clustering, Embedding}
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val d = Files.createTempDirectory("graft-g17-").toString
    docs.write.mode("overwrite").parquet(d)
    val cents = Clustering.kmeansTrain(
      Embedding.hashEmbedding(docs, "doc_id", "text", 16),
      k = 3, iters = 2, idCol = "doc_id", vecCol = "embedding")
    // the full stateless lambda path: stream -> embed -> assign
    val stream = EventStream.clusterAssignStream(
      EventStream.embedStream(
        spark.readStream.schema(docs.schema).parquet(d), "doc_id", "text", 16),
      cents, "embedding")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("g17").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("g17")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[Int]]("embedding"), r.getAs[Long]("cluster")))).toMap
    val batch = Clustering.withClusterColumns(
        Embedding.hashEmbedding(docs, "doc_id", "text", 16), cents, "embedding")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[Int]]("embedding"), r.getAs[Long]("cluster")))).toMap
    assert(streamed == batch)
    assert(streamed.values.map(_._2).toSet.size > 1)
  }

  test("G12: streaming corpus filter+score is row-for-row identical to the batch expressions") {
    import graft.operators.{QualityRules, TextClassifier}
    val d = Files.createTempDirectory("graft-stream-docs-").toString
    Files.copy(new java.io.File(s"$sf/documents.parquet").toPath,
      new java.io.File(s"$d/documents.parquet").toPath)
    val schema = Tables.documents(spark, sf).schema
    val w = TextClassifier.hashedWeights(4096)
    // relaxed rule gate (the published thresholds are calibrated for
    // web text, not the fixture's synthetic prose) + a quality floor
    // at the corpus median so the gate provably keeps AND drops
    val thr = QualityRules.GopherThresholds(
      minWords = 5, maxWords = 100000, minMeanWordLen = 1.0, maxMeanWordLen = 20.0,
      maxSymbolWordRatio = 1.0, maxBulletLineFrac = 1.0, maxEllipsisLineFrac = 1.0,
      minAlphaWordFrac = 0.0, minStopwords = 0)
    val allQ = Tables.documents(spark, sf)
      .select(graft.functions.text.qualityScore(F.col("text")).as("q"))
      .collect().map(_.getDouble(0)).sorted
    val cut = allQ(allQ.length / 2)
    val stream = EventStream.corpusFilterStream(
      spark.readStream.schema(schema).parquet(d), "text", thr, cut, w)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("g12").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("g12")
      .select("doc_id", "clf_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch application of the identical gate + scorer
    val docs = Tables.documents(spark, sf)
    val batchKept = docs.filter(
        QualityRules.gopherPass(F.col("text"), thr) &&
          graft.functions.text.qualityScore(F.col("text")) >= cut)
    val batchScores = TextClassifier.score(batchKept, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed.keySet == batchScores.keySet,
      s"gate mismatch: ${streamed.size} streamed vs ${batchScores.size} batch")
    assert(streamed.nonEmpty && streamed.size < docs.count(),
      "gate must keep some docs and drop some docs for the parity to mean anything")
    streamed.foreach { case (id, s) =>
      assert(s == batchScores(id), s"doc $id score drift") }
    // schema contract: original columns survive, score decorates
    assert(spark.table("g12").columns.toSeq ==
      docs.columns.toSeq :+ "clf_score")
  }

  test("G14: versioned-commit sink — one time-travelable commit per batch; replays skipped") {
    import spark.implicits._
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-g14-").toString
    val table = s"$dir/table"
    val base = 1000000L
    // two input files + maxFilesPerTrigger=1 -> two micro-batches
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.mode("append").parquet(s"$dir/in")
    Seq((3L, "c")).toDF("id", "v").coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStream.versionedAppendSink(stream, table, base)
      .option("checkpointLocation", s"$dir/chk").start()
    q.awaitTermination(60000)
    // content: the union of all batches; one commit per batch at
    // exactly base + batchId
    assert(Versioned.read(spark, table).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    val commits = Versioned.commits(spark, table)
    assert(commits.size == 2)
    assert(commits.map(_.commitTsUs) == commits.indices.map(base + _.toLong))
    // the ingest history is time-travelable: AS OF the first commit
    // sees only that batch's rows
    val firstN = Versioned.readAsOf(spark, table, base).count()
    assert(firstN == 1L || firstN == 2L)
    assert(Versioned.readAsOf(spark, table, base + 1).count() == 3L)
    // redelivery: an already-committed batchId is a no-op (the
    // manifest is the ledger); the next id commits
    val extra = Seq((9L, "z")).toDF("id", "v")
    assert(EventStream.applyVersionedBatch(extra, table, base, 0L).isEmpty)
    assert(EventStream.applyVersionedBatch(extra, table, base, 1L).isEmpty)
    assert(Versioned.read(spark, table).count() == 3L)
    val next = EventStream.applyVersionedBatch(extra, table, base, 2L)
    assert(next.isDefined && next.get.commitTsUs == base + 2)
    assert(Versioned.read(spark, table).count() == 4L)
  }

  test("G15: versioned MERGE sink — upserts commit labeled snapshots; pre-merge states readable AS OF") {
    import spark.implicits._
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-g15-").toString
    val table = s"$dir/table"
    val base = 2000000L
    // seed the dimension table below the stream's ledger base
    Versioned.overwrite(Seq((1L, "v0"), (2L, "v0")).toDF("id", "v"), table, Some(1000L))
    // two micro-batches: batch A updates id 1 + inserts 3; batch B
    // updates id 3 again
    Seq((1L, "v1"), (3L, "v1")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    Seq((3L, "v2")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = EventStream.versionedMergeSink(stream, table, Seq("id"), base)
      .option("checkpointLocation", s"$dir/chk").start()
    q.awaitTermination(60000)

    val fin = Versioned.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // both batches merged in order: 3 ends at its last delivered value
    assert(fin(2L) == "v0" && fin.contains(3L), s"got $fin")
    val commits = Versioned.commits(spark, table)
    assert(commits.map(_.action) == Seq("overwrite", "merge", "merge"))
    assert(commits.drop(1).map(_.commitTsUs) == Seq(base, base + 1))
    // pre-merge history: AS OF the seed commit reads the original rows
    val seed = Versioned.readAsOf(spark, table, 1000L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(seed == Map(1L -> "v0", 2L -> "v0"))
    // replayed batchIds skip (manifest-as-ledger): re-running the same
    // input against the same table with a FRESH checkpoint leaves
    // content and version count untouched
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q2 = EventStream.versionedMergeSink(stream2, table, Seq("id"), base)
      .option("checkpointLocation", s"$dir/chk2").start()
    q2.awaitTermination(60000)
    assert(Versioned.commits(spark, table).size == commits.size)
    assert(Versioned.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == fin)
  }

  test("G15: versioned MERGE sink bootstraps a fresh (unseeded) table") {
    import spark.implicits._
    import graft.sources.Versioned
    val dir = Files.createTempDirectory("graft-g15b-").toString
    val table = s"$dir/table" // never seeded: no commit exists yet
    val base = 1000000L
    // batch A inserts ids 1,2; batch B upserts 2 and inserts 3
    Seq((1L, "v1"), (2L, "v1")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    Seq((2L, "v2"), (3L, "v1")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    // the first micro-batch must NOT throw "not a versioned table":
    // merging into an empty target is pure insert, so it commits
    // directly as the bootstrap version
    val q = EventStream.versionedMergeSink(stream, table, Seq("id"), base)
      .option("checkpointLocation", s"$dir/chk").start()
    q.awaitTermination(60000)
    val commits = Versioned.commits(spark, table)
    assert(commits.size == 2, s"expected 2 commits, got $commits")
    assert(commits.map(_.commitTsUs) == Seq(base, base + 1))
    val fin = Versioned.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin.keySet == Set(1L, 2L, 3L), s"got $fin")
    assert(fin(1L) == "v1")
    // the bootstrap version stays time-travelable: AS OF the first
    // commit sees exactly one batch's rows
    assert(Versioned.readAsOf(spark, table, base).count() == 2L)
  }

  test("readEvents: empty directory fails fast unless the wire ts type is declared") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val empty = Files.createTempDirectory("graft-stream-empty-").toString
    // no files, no declaration: refuse to guess (a silent nanos default
    // would misparse a timestamp[us] feed 1000x once files arrive)
    val ex = intercept[IllegalArgumentException] {
      EventStream.readEvents(spark, empty)
    }
    assert(ex.getMessage.contains("wireTsType"))
    // an explicit declaration starts the stream on the empty dir; once
    // files arrive under that generation the rows parse correctly
    val declared = EventStream.readEvents(spark, empty, Some(TimestampNTZType))
    val q = declared.writeStream.outputMode("append")
      .format("memory").queryName("empty_start").start()
    q.processAllAvailable()
    assert(spark.table("empty_start").count() == 0)
    // ship one generation of files into the running stream's directory
    val batch = Tables.events(spark, sf).limit(100)
      .withColumn("ts", F.col("ts").cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.coalesce(1).write.mode("append").parquet(empty)
    q.processAllAvailable(); q.stop()
    assert(spark.table("empty_start").count() == 100)
    assert(spark.table("empty_start").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // the declared legacy spelling still parses nanos feeds
    val legacyDir = Files.createTempDirectory("graft-stream-legacy-").toString
    val legacy = EventStream.readEvents(spark, legacyDir, Some(LongType))
    assert(legacy.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
  }

  test("Replay: slices stream back one per micro-batch, in slice-index order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-replay-").toString
    val df = (0 until 40).map(i => (i.toLong, s"row$i")).toDF("id", "tag")
    val schema = graft.streaming.Replay.writeSlices(df, dir, F.pmod(F.col("id"), F.lit(4)), 4)
    var batches = Seq.empty[(Long, Set[Long])]
    val q = graft.streaming.Replay.readSliced(spark, dir, schema)
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches = batches :+ (id -> b.select("id").collect().map(_.getLong(0)).toSet)
      }.start()
    q.awaitTermination()
    // exactly 4 micro-batches, batch i carrying slice i (pmod(id,4)=i),
    // in index order — the determinism the stream_* faces stand on
    assert(batches.map(_._1) == Seq(0L, 1L, 2L, 3L))
    for ((id, ids) <- batches) {
      assert(ids.nonEmpty && ids.forall(_ % 4 == id), s"batch $id got $ids")
    }
    assert(batches.flatMap(_._2).toSet == (0L until 40L).toSet)
    // a slice expression that loses rows is loud, not silent
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.Replay.writeSlices(df,
        Files.createTempDirectory("graft-replay-bad-").toString,
        F.pmod(F.col("id"), F.lit(5)), 4)
    }
    assert(ex.getMessage.contains("outside slices"))
  }

  test("G3 byEventTime: out-of-order micro-batches converge to the in-order final state") {
    import spark.implicits._
    // key K's NEWEST row (by ts) arrives in the FIRST micro-batch; an
    // arrival-order merge would let the older row from batch 1
    // overwrite it — byEventTime must keep the newest
    val rows = Seq(
      (1L, "a", 100L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 9.0), // newest, batch 0
      (1L, "a", 101L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0), // older, batch 1
      (2L, "b", 200L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0), // batch 0
      (2L, "b", 201L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 3.0)  // tie ts, batch 1: max event_id wins
    ).toDF("user_id", "event_type", "event_id", "ts", "value")
    val dir = Files.createTempDirectory("graft-g3et-").toString
    val schema = graft.streaming.Replay.writeSlices(rows, dir,
      F.pmod(F.col("event_id"), F.lit(2)), 2)
    var state: Option[DataFrame] = None
    val q = EventStream.mergeSink(graft.streaming.Replay.readSliced(spark, dir, schema),
        Seq("user_id", "event_type"),
        () => state, m => state = Some(m.cache()),
        orderCol = Some("ts"), byEventTime = true, tieBreak = Seq("event_id"))
      .option("checkpointLocation", s"$dir-chk").start()
    q.awaitTermination()
    val got = state.get.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 100L), (2L, 201L)),
      s"event-time merge must keep max (ts, event_id): $got")
  }
}
