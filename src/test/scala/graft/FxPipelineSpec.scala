package graft

import graft.sources.Tables
import org.apache.spark.sql.{functions => F}
import java.nio.file.Files

class FxPipelineSpec extends SparkSuite {

  test("end-to-end: ingest twice is idempotent; report matches direct aggregation") {
    val root = Files.createTempDirectory("graft-fxpipe-").toString
    val raw = s"$root/exchange_rate"
    val rep = s"$root/exchange_rate_report"
    val events = Tables.events(spark, sf)

    // run 1: first half of the feed; run 2: full feed (overlapping redelivery)
    val batch1 = events.filter(F.col("event_id") < 500)
    FxPipeline.ingest(spark, batch1, raw)
    val afterFirst = spark.read.parquet(raw).count()
    assert(afterFirst == batch1.count())

    FxPipeline.ingest(spark, events, raw)
    val afterSecond = spark.read.parquet(raw).count()
    assert(afterSecond == events.count(), "redelivered rows must not duplicate")

    // re-running the same batch changes nothing
    FxPipeline.ingest(spark, events, raw)
    assert(spark.read.parquet(raw).count() == afterSecond)

    // report: per-day averages merged; matches aggregation over the raw table
    val out = FxPipeline.report(spark, raw, rep)
    val want = spark.read.parquet(raw)
      .groupBy(F.to_date(F.col("ts")).as("day"), F.col("event_type"))
      .agg(F.avg("rate").as("avg_rate"))
    val got = out.select("day", "event_type", "avg_rate")
    assert(got.count() == want.count())
    assert(got.exceptAll(want.select("day", "event_type", "avg_rate")).count() == 0)

    // re-running report is stable (MERGE overwrites with identical rows);
    // count the first result BEFORE the swap invalidates its file listing
    val firstCount = out.count()
    val out2 = FxPipeline.report(spark, raw, rep)
    assert(out2.count() == firstCount)
  }
}
