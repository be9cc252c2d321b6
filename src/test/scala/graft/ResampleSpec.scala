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
