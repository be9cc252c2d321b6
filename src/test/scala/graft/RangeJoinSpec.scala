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
}
