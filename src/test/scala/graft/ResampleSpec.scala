package graft

import graft.operators.Resample
import org.apache.spark.sql.{functions => F}

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("forward fill densifies gaps, carries values, flags observations") {
    val daily = Seq(
      ("EUR", d("2024-01-01"), 1.0),
      ("EUR", d("2024-01-04"), 4.0),
      ("JPY", d("2024-01-02"), 2.0)).toDF("cur", "day", "rate")
    val out = Resample.forwardFillDaily(daily, Seq("cur"), "day", "rate")
      .orderBy("cur", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("EUR", "2024-01-01", 1.0, 1),
      ("EUR", "2024-01-02", 1.0, 0), // weekend-style gap: carried forward
      ("EUR", "2024-01-03", 1.0, 0),
      ("EUR", "2024-01-04", 4.0, 1),
      ("JPY", "2024-01-01", null, 0), // before first observation: stays null
      ("JPY", "2024-01-02", 2.0, 1),
      ("JPY", "2024-01-03", 2.0, 0),
      ("JPY", "2024-01-04", 2.0, 0)))
  }

  test("gapFill linear interpolates interior gaps, leaves unbracketed edges null") {
    val daily = Seq(
      ("EUR", d("2024-01-02"), 1.0),
      ("EUR", d("2024-01-06"), 9.0), // 3-day interior gap: fractions 1/4..3/4
      ("JPY", d("2024-01-03"), 5.0)).toDF("cur", "day", "rate")
    val out = Resample.gapFill(daily, Seq("cur"), "day", Seq("rate" -> "linear"))
      .orderBy("cur", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("EUR", "2024-01-02", 1.0),
      ("EUR", "2024-01-03", 3.0),
      ("EUR", "2024-01-04", 5.0),
      ("EUR", "2024-01-05", 7.0),
      ("EUR", "2024-01-06", 9.0),
      ("JPY", "2024-01-02", null), // leading: no left bracket
      ("JPY", "2024-01-03", 5.0),
      ("JPY", "2024-01-04", null), // trailing: no right bracket
      ("JPY", "2024-01-05", null),
      ("JPY", "2024-01-06", null)))
  }

  test("gapFill rejects an unknown method loudly") {
    val daily = Seq(("A", d("2024-01-01"), 1.0)).toDF("k", "day", "v")
    val e = intercept[IllegalArgumentException] {
      Resample.gapFill(daily, Seq("k"), "day", Seq("v" -> "spline"))
    }
    assert(e.getMessage.contains("spline"))
  }

  test("sessionizeRanges: MEETS merges overlapping and adjacent; OVERLAPS splits adjacency") {
    val rows = Seq(
      // key A: [1,5) [5,8) adjacent, [10,12) separate
      ("A", d("2024-01-01"), d("2024-01-05")),
      ("A", d("2024-01-05"), d("2024-01-08")),
      ("A", d("2024-01-10"), d("2024-01-12")),
      // key B: [1,4) [2,3) nested
      ("B", d("2024-01-01"), d("2024-01-04")),
      ("B", d("2024-01-02"), d("2024-01-03")))
      .toDF("k", "s", "e")
      .select(F.col("k"), F.struct(F.col("s").as("range_start"), F.col("e").as("range_end")).as("rng"))
    val meets = Resample.sessionizeRanges(rows, "rng", Seq("k"), "MEETS")
      .select("k", "session_range.range_start", "session_range.range_end").distinct().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString)).toSet
    assert(meets == Set(
      ("A", "2024-01-01", "2024-01-08"), ("A", "2024-01-10", "2024-01-12"),
      ("B", "2024-01-01", "2024-01-04")))
    val overlaps = Resample.sessionizeRanges(rows, "rng", Seq("k"), "OVERLAPS")
      .select("k", "session_range.range_start", "session_range.range_end").distinct().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString)).toSet
    assert(overlaps == Set(
      ("A", "2024-01-01", "2024-01-05"), ("A", "2024-01-05", "2024-01-08"),
      ("A", "2024-01-10", "2024-01-12"), ("B", "2024-01-01", "2024-01-04")))
  }

  test("sessionizeRanges: unbounded sides glue and surface as NULL bounds") {
    val rows = Seq(
      ("A", Some(d("2024-01-01")), Option.empty[java.sql.Date]), // [1, inf)
      ("A", Some(d("2024-03-01")), Some(d("2024-03-02"))),       // glued by inf end
      ("B", Option.empty[java.sql.Date], Some(d("2024-01-05"))), // (-inf, 5)
      ("B", Some(d("2024-01-04")), Some(d("2024-01-09"))))
      .toDF("k", "s", "e")
      .select(F.col("k"), F.struct(F.col("s").as("range_start"), F.col("e").as("range_end")).as("rng"))
    val out = Resample.sessionizeRanges(rows, "rng", Seq("k"))
      .select("k", "session_range.range_start", "session_range.range_end").distinct().collect()
      .map(r => (r.getString(0),
        Option(r.getDate(1)).map(_.toString), Option(r.getDate(2)).map(_.toString))).toSet
    assert(out == Set(
      ("A", Some("2024-01-01"), None),
      ("B", None, Some("2024-01-09"))))
    intercept[IllegalArgumentException](
      Resample.sessionizeRanges(rows, "rng", Seq("k"), "TOUCHES"))
    intercept[IllegalArgumentException](
      Resample.sessionizeRanges(rows, "nope", Seq("k")))
  }

  test("RANGE_SESSIONIZE TVF + RANGE_INTERSECT through GraftSql.load") {
    Seq(
      (1, d("2024-01-01"), d("2024-01-05")),
      (1, d("2024-01-05"), d("2024-01-08")),
      (1, d("2024-02-01"), d("2024-02-02")),
      (2, d("2024-01-03"), d("2024-01-04")))
      .toDF("id", "s", "e")
      .select(F.col("id"), F.struct(F.col("s").as("range_start"), F.col("e").as("range_end")).as("rng"))
      .createOrReplaceTempView("rs_tvf_in")
    val out = GraftSql.load(spark,
      """SELECT id, RANGE_START(session_range) AS ss, RANGE_END(session_range) AS se,
        |       COUNT(*) AS n
        |FROM RANGE_SESSIONIZE(TABLE rs_tvf_in, 'rng', ['id'])
        |GROUP BY id, ss, se ORDER BY id, ss""".stripMargin).collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      (1, "2024-01-01", "2024-01-08", 2L),
      (1, "2024-02-01", "2024-02-02", 1L),
      (2, "2024-01-03", "2024-01-04", 1L)))
    // default mode omits the list; OVERLAPS splits the adjacency
    val n = GraftSql.load(spark,
      "SELECT COUNT(DISTINCT RANGE_START(session_range)) AS c " +
        "FROM RANGE_SESSIONIZE(TABLE rs_tvf_in, 'rng', ['id'], 'OVERLAPS')").head().getLong(0)
    assert(n == 4L)
    // RANGE_INTERSECT: clamped intersection; non-overlap raises
    val ix = GraftSql.load(spark,
      """SELECT RANGE_START(RANGE_INTERSECT(RANGE(DATE '2024-01-01', DATE '2024-01-10'),
        |                                   RANGE(DATE '2024-01-05', NULL))) AS s,
        |       RANGE_END(RANGE_INTERSECT(RANGE(DATE '2024-01-01', DATE '2024-01-10'),
        |                                 RANGE(DATE '2024-01-05', NULL))) AS e""".stripMargin).head()
    assert(ix.getDate(0).toString == "2024-01-05" && ix.getDate(1).toString == "2024-01-10")
    val err = intercept[Exception](GraftSql.load(spark,
      """SELECT RANGE_INTERSECT(RANGE(DATE '2024-01-01', DATE '2024-01-02'),
        |                       RANGE(DATE '2024-01-02', DATE '2024-01-03')) AS x""".stripMargin).collect())
    assert(err.getMessage.contains("RANGE_INTERSECT") || err.getCause != null)
  }

  test("gapFillTs densifies an hourly grid; locf and micros-linear fill") {
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val hourly = Seq(
      ("A", t("2024-01-01 00:00:00"), Some(10.0)),
      ("A", t("2024-01-01 03:00:00"), Some(40.0)), // 2 missing hours
      ("B", t("2024-01-01 01:00:00"), Some(5.0)))
      .toDF("k", "ts", "v")
    val out = Resample.gapFillTs(hourly, Seq("k"), "ts", Seq("v" -> "locf"), 3600000000L)
    // grid spans 00:00..03:00 for BOTH keys (shared span)
    assert(out.filter(F.col("k") === "A").count() == 4)
    val locf = out.filter(F.col("k") === "A").orderBy("ts")
      .collect().map(r => Option(r.get(2)).map(_.toString).orNull).toSeq
    assert(locf == Seq("10.0", "10.0", "10.0", "40.0"))
    // linear: interior hours interpolate on the micros axis
    val lin = Resample.gapFillTs(hourly, Seq("k"), "ts", Seq("v" -> "linear"), 3600000000L)
      .filter(F.col("k") === "A").orderBy("ts")
      .collect().map(r => Option(r.get(2)).map(_.toString).orNull).toSeq
    assert(lin == Seq("10.0", "20.0", "30.0", "40.0"))
    // the TVF accepts sub-day widths; month-family widths stay loud
    hourly.createOrReplaceTempView("gf_hourly")
    val sql = GraftSql.load(spark,
      """SELECT k, ts, v FROM GAP_FILL(TABLE gf_hourly, ts_column => 'ts',
        |bucket_width => INTERVAL 1 HOUR,
        |partitioning_columns => ['k'],
        |value_columns => [('v', 'linear')])
        |WHERE k = 'A' ORDER BY ts""".stripMargin)
      .collect().map(r => Option(r.get(2)).map(_.toString).orNull).toSeq
    assert(sql == Seq("10.0", "20.0", "30.0", "40.0"))
    assert(intercept[IllegalArgumentException](GraftSql.load(spark,
      """SELECT * FROM GAP_FILL(TABLE gf_hourly, ts_column => 'ts',
        |bucket_width => INTERVAL 1 MONTH)""".stripMargin))
      .getMessage.contains("MONTH"))
    assert(intercept[IllegalArgumentException](GraftSql.load(spark,
      """SELECT * FROM GAP_FILL(TABLE gf_hourly, ts_column => 'ts',
        |bucket_width => INTERVAL 2 DAY)""".stripMargin))
      .getMessage.contains("INTERVAL 1 DAY"))
  }

  test("a dense series round-trips unchanged (all rows observed)") {
    val daily = Seq(
      ("A", d("2024-02-01"), 1.0), ("A", d("2024-02-02"), 2.0), ("A", d("2024-02-03"), 3.0))
      .toDF("k", "day", "v")
    val out = Resample.forwardFillDaily(daily, Seq("k"), "day", "v")
    assert(out.count() == 3)
    assert(out.agg(F.sum("observed")).head().getLong(0) == 3L)
    assert(out.select("k", "day", "v").exceptAll(daily).count() == 0)
  }
}
