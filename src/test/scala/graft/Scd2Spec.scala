package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.operators.Scd2
import graft.sources.Tables

/** fromHistory output columns: key(0), attr(1), valid_from(2),
  * valid_to(3), is_current(4).
  */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def sig(df: DataFrame): Map[String, Long] =
    df.select(F.md5(F.concat_ws("|", df.columns.sorted.map(c => F.col(c).cast("string")): _*)).as("h"))
      .groupBy("h").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap

  // synthetic observation history: (key, ts, tie, attr) with runs
  private def history(seed: Int, nKeys: Int, nObs: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    (1 to nObs).map { i =>
      (s"k${rng.nextInt(nKeys)}", i.toLong * 10 + rng.nextInt(5), i.toLong, rng.nextInt(3))
    }.toDF("key", "ts", "tie", "attr")
  }

  test("intervals tile the timeline: chained bounds, changed attrs, one current per key") {
    val iv = Scd2.fromHistory(history(1, 5, 400), Seq("key"), "ts", "tie", Seq("attr"))
      .collect()
    for ((_, rows) <- iv.groupBy(_.getString(0))) {
      val sorted = rows.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2), "valid_to must chain to the next valid_from")
          assert(a.getInt(1) != b.getInt(1), "consecutive runs must differ in attrs")
        case _ => ()
      }
      assert(sorted.init.forall(!_.getBoolean(4)) && sorted.last.getBoolean(4),
        "exactly the last interval is current")
      assert(sorted.last.isNullAt(3), "current interval has null valid_to")
    }
  }

  test("as-of correctness: every observation falls in an interval with its own attrs") {
    val h = history(2, 4, 300)
    val iv = Scd2.fromHistory(h, Seq("key"), "ts", "tie", Seq("attr"))
    // ties at the same ts: the run boundary is (ts, tie)-ordered, so
    // compare against the LAST observation at each (key, ts)
    val lastAtTs = h.withColumn(
      "rn", F.row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("key", "ts").orderBy(F.col("tie").desc))).filter(F.col("rn") === 1)
    val joined = lastAtTs.as("o").join(iv.as("i"),
      F.col("o.key") === F.col("i.key") &&
        F.col("o.ts") >= F.col("i.valid_from") &&
        (F.col("i.valid_to").isNull || F.col("o.ts") < F.col("i.valid_to")))
    assert(joined.count() == lastAtTs.count(), "each observation maps to exactly one interval")
    assert(joined.filter(F.col("o.attr") =!= F.col("i.attr")).count() == 0,
      "interval attrs must match the observation")
  }

  test("applyBatch reproduces the full-history recompute across splits") {
    val h = history(3, 5, 500)
    val full = Scd2.fromHistory(h, Seq("key"), "ts", "tie", Seq("attr"))
    for (cut <- Seq(1000L, 2500L, 4000L)) {
      val current = Scd2.fromHistory(h.filter(F.col("ts") < cut), Seq("key"), "ts", "tie", Seq("attr"))
      val batch = h.filter(F.col("ts") >= cut)
      val merged = Scd2.applyBatch(current, batch, Seq("key"), "ts", "tie", Seq("attr"))
      assert(sig(merged) == sig(full), s"applyBatch diverged from recompute at cut=$cut")
    }
  }

  test("applyBatch keeps (ts, tie) order for same-timestamp batch observations") {
    // two observations at the SAME ts in one batch: the tie column
    // decides the run order, and applyBatch must agree with the full
    // recompute (regression: the re-collapse used to drop the tie)
    val h = Seq(
      ("a", 10L, 1L, 1), // history
      ("a", 30L, 2L, 2), ("a", 30L, 3L, 3) // batch: same ts, tie-ordered
    ).toDF("key", "ts", "tie", "attr")
    val full = Scd2.fromHistory(h, Seq("key"), "ts", "tie", Seq("attr"))
    val current = Scd2.fromHistory(h.filter(F.col("ts") < 30), Seq("key"), "ts", "tie", Seq("attr"))
    val merged = Scd2.applyBatch(current, h.filter(F.col("ts") >= 30),
      Seq("key"), "ts", "tie", Seq("attr"))
    assert(sig(merged) == sig(full))
    // attr=3 (the higher tie) must be the current one
    val cur = merged.filter(F.col("is_current")).collect()
    assert(cur.length == 1 && cur.head.getInt(1) == 3)
  }

  test("applyBatch handles new keys and untouched keys") {
    val current = Scd2.fromHistory(
      Seq(("a", 10L, 1L, 1), ("a", 20L, 2L, 2)).toDF("key", "ts", "tie", "attr"),
      Seq("key"), "ts", "tie", Seq("attr"))
    val batch = Seq(("b", 30L, 3L, 7)).toDF("key", "ts", "tie", "attr") // brand-new key
    val merged = Scd2.applyBatch(current, batch, Seq("key"), "ts", "tie", Seq("attr"))
      .orderBy("key", "valid_from").collect()
    assert(merged.length == 3)
    assert(merged.count(_.getBoolean(4)) == 2, "one current row per key")
    // untouched key 'a' keeps its intervals bit-for-bit
    assert(merged.filter(_.getString(0) == "a").map(_.getLong(2)).toSeq == Seq(10L, 20L))
  }

  test("an unchanged leading batch run extends the open interval (no spurious version)") {
    val current = Scd2.fromHistory(
      Seq(("a", 10L, 1L, 5)).toDF("key", "ts", "tie", "attr"),
      Seq("key"), "ts", "tie", Seq("attr"))
    val batch = Seq(("a", 20L, 2L, 5), ("a", 30L, 3L, 6)).toDF("key", "ts", "tie", "attr")
    val merged = Scd2.applyBatch(current, batch, Seq("key"), "ts", "tie", Seq("attr"))
      .orderBy("valid_from").collect()
    assert(merged.length == 2, "unchanged observation must not open a new version")
    assert(merged(0).getLong(2) == 10L && merged(0).getLong(3) == 30L)
    assert(merged(1).getLong(2) == 30L && merged(1).getBoolean(4))
  }

  test("assertNoLateData: a late batch throws; an on-time batch passes unchanged") {
    val current = Scd2.fromHistory(
      Seq(("a", 10L, 1L, 5), ("a", 50L, 2L, 6), ("b", 20L, 3L, 1))
        .toDF("key", "ts", "tie", "attr"),
      Seq("key"), "ts", "tie", Seq("attr"))
    // key a's open interval starts at 50; a batch observation at 50 (or
    // earlier) violates the strictly-later precondition
    val late = Seq(("a", 50L, 9L, 7), ("b", 99L, 10L, 2)).toDF("key", "ts", "tie", "attr")
    val e = intercept[IllegalStateException] {
      Scd2.applyBatch(current, late, Seq("key"), "ts", "tie", Seq("attr"),
        assertNoLateData = true)
    }
    assert(e.getMessage.contains("1 key(s)"))
    // without the guard the same call silently builds a frame (the
    // documented hazard the flag exists to catch)
    Scd2.applyBatch(current, late, Seq("key"), "ts", "tie", Seq("attr"))
    // an on-time batch passes the guard and matches the unguarded fold
    val ok = Seq(("a", 60L, 9L, 7), ("b", 99L, 10L, 2)).toDF("key", "ts", "tie", "attr")
    val guarded = Scd2.applyBatch(current, ok, Seq("key"), "ts", "tie", Seq("attr"),
      assertNoLateData = true)
    val plain = Scd2.applyBatch(current, ok, Seq("key"), "ts", "tie", Seq("attr"))
    assert(sig(guarded) == sig(plain))
  }

  test("fromHistory plans ONE exchange (both windows share partitioning and order)") {
    val h = Tables.events(spark, sf).select(
      F.col("event_type"), F.col("event_id"),
      F.unix_micros(F.col("ts")).as("ts_us"),
      F.floor(F.col("value") / 10).cast("long").as("band"))
    val iv = Scd2.fromHistory(h, Seq("event_type"), "ts_us", "event_id", Seq("band"))
    // string count (AdaptiveSparkPlanExec hides children from collect)
    val plan = iv.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    assert("Sort ".r.findAllIn(plan).size == 1, s"both windows must share one sort:\n$plan")
  }
}
