package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{functions => F}
import graft.operators.Audit

/** A29 — the (day × key) completeness grid: zero-filled holes, the
  * missing-partition alarm face, and the pinned-`to` tail-gap case the
  * observed max day would hide.
  */
class AuditSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, h: Int = 9) = Timestamp.valueOf(f"2026-01-$day%02d $h%02d:00:00")

  private lazy val feed = Seq(
    // key "a": days 1,2,4 (hole on 3)
    (ts(1), "a"), (ts(2), "a"), (ts(2, 14), "a"), (ts(4), "a"),
    // key "b": days 1..4 dense
    (ts(1), "b"), (ts(2), "b"), (ts(3), "b"), (ts(4), "b")
  ).toDF("ts", "key")

  test("grid is dense, holes zero-filled, counts exact") {
    val out = Audit.completeness(feed, "ts", Seq("key"))
      .orderBy("day", "key").collect()
    assert(out.length == 8) // 4 days × 2 keys
    val m = out.map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("2026-01-02", "a")) == 2L)
    assert(m(("2026-01-03", "a")) == 0L)
    assert(m(("2026-01-03", "b")) == 1L)
    assert(out.map(_.getLong(2)).sum == 8L)
  }

  test("missingPartitions is exactly the zero cells") {
    val miss = Audit.missingPartitions(feed, "ts", Seq("key")).collect()
    assert(miss.map(r => (r.getDate(0).toString, r.getString(1))).toSet ==
      Set(("2026-01-03", "a")))
  }

  test("pinned `to` surfaces the silent tail gap the observed max would hide") {
    val miss = Audit.missingPartitions(feed, "ts", Seq("key"), to = Some("2026-01-06"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1))).toSet
    assert(miss == Set(
      ("2026-01-03", "a"),
      ("2026-01-05", "a"), ("2026-01-05", "b"),
      ("2026-01-06", "a"), ("2026-01-06", "b")))
  }

  test("`from`/`to` bound the scan: outside rows neither counted nor gridded") {
    val out = Audit.completeness(feed, "ts", Seq("key"),
      from = Some("2026-01-02"), to = Some("2026-01-03"))
      .orderBy("day", "key").collect()
    assert(out.map(_.getDate(0).toString).distinct.toSeq ==
      Seq("2026-01-02", "2026-01-03"))
    assert(out.length == 4)
  }

  test("an inverted audit window fails loudly at construction") {
    val e = intercept[IllegalArgumentException] {
      Audit.completeness(feed, "ts", Seq("key"),
        from = Some("2026-01-04"), to = Some("2026-01-02"))
    }
    assert(e.getMessage.contains("audit window is empty"))
  }

  test("fixture events: punched holes are exactly the reported zero cells") {
    val e = sources.Tables.events(spark, sf).filter(
      !(F.dayofmonth(F.col("ts")) % 5 === 0 && F.col("event_type") === "click"))
    val out = Audit.completeness(e, "ts", Seq("event_type"))
    val zeros = out.where(F.col("n_rows") === 0)
      .collect().map(r => (r.getDate(0), r.getString(1)))
    assert(zeros.nonEmpty, "the punch pattern must create holes")
    assert(zeros.forall { case (d, t) =>
      t == "click" && d.toLocalDate.getDayOfMonth % 5 == 0 })
    // grid total equals the filtered row count
    val total = out.agg(F.sum("n_rows")).head().getLong(0)
    assert(total == e.count())
  }
}
