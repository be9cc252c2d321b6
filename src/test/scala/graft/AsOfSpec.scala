package graft

import graft.operators.{AsOf, Skew}
import org.apache.spark.sql.{functions => F}

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left ts") {
    val rates = Seq(
      ("EUR", ts("2024-01-01 00:00:00"), 1.05),
      ("EUR", ts("2024-01-03 00:00:00"), 1.10),
      ("GBP", ts("2024-01-02 00:00:00"), 0.85)
    ).toDF("cur", "ts", "rate")
    val events = Seq(
      (1L, "EUR", ts("2024-01-02 12:00:00")), // between updates -> 1.05
      (2L, "EUR", ts("2024-01-03 00:00:00")), // exactly at update -> 1.10
      (3L, "EUR", ts("2024-01-04 00:00:00")), // after last -> 1.10
      (4L, "GBP", ts("2024-01-01 00:00:00")), // before any -> dropped (inner)
      (5L, "GBP", ts("2024-01-05 00:00:00"))  // -> 0.85
    ).toDF("id", "cur", "ts")
    val out = AsOf.join(events, rates, Seq("cur"), "ts", "ts", Seq("rate"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1.05), (2L, 1.10), (3L, 1.10), (5L, 0.85)))
    val outer = AsOf.join(events, rates, Seq("cur"), "ts", "ts", Seq("rate"), inner = false)
    assert(outer.count() == 5)
    assert(outer.filter(F.col("rate").isNull).count() == 1)
  }

  test("salted two-phase stats equal the single-phase aggregate exactly") {
    val e = graft.sources.Tables.events(spark, sf).withColumn("day",
      F.to_date(F.date_trunc("day", F.col("ts"))))
    val salted = Skew.saltedStats(e, Seq("day", "event_type"), "value")
      .select("day", "event_type", "n", "sum", "avg")
    val plain = e.groupBy("day", "event_type")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").as("sum"))
      .withColumn("avg", F.col("sum") / F.col("n"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
