package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(F.col("point_key").cast("long"), F.col("range_key").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fixture: (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, sf)
    val points = o.select(F.col("o_orderkey").as("point_key"),
      F.col("o_totalprice"), F.col("o_orderpriority"))
    val intervals = o.filter(F.col("o_orderkey") % 50 === 0)
      .select(F.col("o_orderkey").as("range_key"),
        (F.col("o_totalprice") - 5000.0).as("lo"),
        (F.col("o_totalprice") + 5000.0).as("hi"),
        F.col("o_orderpriority"))
    (points, intervals)
  }

  test("binned range join matches the naive cross+filter join, with no duplicate pairs") {
    val (points, intervals) = fixture
    val binned = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"), binWidth = Some(10000.0))
    val naive = points.as("p").join(intervals.as("r"),
      F.col("p.o_orderpriority") === F.col("r.o_orderpriority") &&
        F.col("p.o_totalprice") >= F.col("r.lo") && F.col("p.o_totalprice") < F.col("r.hi"))
    assert(pairs(binned) == pairs(naive))
    assert(naive.count() > 0)
    // exactly-once emission: pair count equals distinct pair count
    assert(binned.count() == pairs(binned).size)
  }

  test("plan is an equi-join — no nested-loop or cartesian node") {
    val (points, intervals) = fixture
    val binned = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"), binWidth = Some(10000.0))
    binned.collect()
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("intervals spanning many bins stay exact (binWidth below max interval length)") {
    val (points, intervals) = fixture
    val wide = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"), binWidth = Some(10000.0))
    val narrow = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"), binWidth = Some(700.0))
    assert(pairs(narrow) == pairs(wide))
    assert(narrow.count() == wide.count())
  }

  test("derived binWidth (None) matches the explicit width") {
    val (points, intervals) = fixture
    val explicit = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"), binWidth = Some(10000.0))
    val derived = RangeJoin.join(points, intervals, "o_totalprice", "lo", "hi",
      keys = Seq("o_orderpriority"))
    assert(pairs(derived) == pairs(explicit))
  }

  test("half-open bounds: lo inclusive, hi exclusive; nulls never match") {
    val points = Seq((1L, 0.0), (2L, 10.0), (3L, 5.0)).toDF("point_key", "x")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("point_key", "x"))
    val intervals = Seq((100L, Some(0.0), Some(10.0)), (200L, None, Some(10.0)))
      .toDF("range_key", "lo", "hi")
    val out = RangeJoin.join(points, intervals, "x", "lo", "hi", binWidth = Some(10.0))
    assert(pairs(out) == Set((1L, 100L), (3L, 100L))) // 10.0 excluded; nulls drop
  }

  test("an inverted interval (lo > hi) matches nothing and cannot explode") {
    val points = Seq((1L, 5.0)).toDF("point_key", "x")
    // the inverted interval spans a huge bin range backwards; without
    // the guard, sequence() would descend across ~2e7 bins
    val intervals = Seq((10L, 1e6, -1e6), (20L, 0.0, 10.0)).toDF("range_key", "lo", "hi")
    val out = RangeJoin.join(points, intervals, "x", "lo", "hi", binWidth = Some(0.1))
    assert(pairs(out) == Set((1L, 20L)))
  }

  test("negative domains bin correctly") {
    val points = Seq((1L, -7.5), (2L, -0.5), (3L, 2.0)).toDF("point_key", "x")
    val intervals = Seq((10L, -8.0, -1.0), (20L, -1.0, 3.0)).toDF("range_key", "lo", "hi")
    val out = RangeJoin.join(points, intervals, "x", "lo", "hi", binWidth = Some(7.0))
    assert(pairs(out) == Set((1L, 10L), (2L, 20L), (3L, 20L)))
  }

  // ───────────────────── overlapJoin (interval×interval) ─────────────────────

  private def overlapFixture: (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, sf)
    val a = o.filter(F.col("o_orderkey") % 20 === 0)
      .select(F.col("o_orderkey").as("a_key"),
        (F.col("o_totalprice") - 2500.0).as("a_lo"),
        (F.col("o_totalprice") + 2500.0).as("a_hi"),
        F.col("o_orderpriority"))
    val b = o.filter(F.col("o_orderkey") % 30 === 0)
      .select(F.col("o_orderkey").as("b_key"),
        (F.col("o_totalprice") - 2500.0).as("b_lo"),
        (F.col("o_totalprice") + 2500.0).as("b_hi"),
        F.col("o_orderpriority"))
    (a, b)
  }

  private def opairs(df: DataFrame): Set[(Long, Long)] =
    df.select(F.col("a_key").cast("long"), F.col("b_key").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapJoin matches the naive inequality join, each pair exactly once") {
    val (a, b) = overlapFixture
    val binned = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      keys = Seq("o_orderpriority"), binWidth = Some(5000.0))
    val naive = a.as("x").join(b.as("y"),
      F.col("x.o_orderpriority") === F.col("y.o_orderpriority") &&
        F.col("x.a_lo") < F.col("y.b_hi") && F.col("y.b_lo") < F.col("x.a_hi"))
    assert(opairs(binned) == opairs(naive))
    assert(naive.count() > 0)
    // bin-ownership dedup: row count equals distinct pair count even
    // though every pair shares at least two bins (equal-width windows)
    assert(binned.count() == opairs(binned).size)
  }

  test("overlapJoin with a narrow binWidth (pairs share MANY bins) stays exactly-once") {
    val (a, b) = overlapFixture
    val wide = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      keys = Seq("o_orderpriority"), binWidth = Some(5000.0))
    val narrow = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      keys = Seq("o_orderpriority"), binWidth = Some(333.0))
    assert(opairs(narrow) == opairs(wide))
    assert(narrow.count() == wide.count())
  }

  test("overlapJoin plan is an equi-join; derived width matches explicit") {
    val (a, b) = overlapFixture
    val binned = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      keys = Seq("o_orderpriority"), binWidth = Some(5000.0))
    binned.collect()
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
    val derived = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      keys = Seq("o_orderpriority"))
    assert(opairs(derived) == opairs(binned))
  }

  test("overlapJoin half-open semantics: touching intervals do not overlap; empty/inverted drop") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 5.0, 5.0), (4L, 9.0, -9.0))
      .toDF("a_key", "a_lo", "a_hi")
    val b = Seq((10L, 10.0, 20.0), (20L, 29.0, 35.0), (30L, 4.0, 6.0))
      .toDF("b_key", "b_lo", "b_hi")
    val out = RangeJoin.overlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      binWidth = Some(10.0))
    // [0,10) vs [10,20): touching, NOT overlapping. [3: empty) and
    // [4: inverted) match nothing even though [30: 4..6) covers point 5.
    assert(opairs(out) == Set((1L, 30L), (2L, 20L)))
  }
}
