package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.HeavyHitters
import graft.sources.Tables

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("topCount is exact when maxItemsTracked covers the distinct count") {
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.topCount(Tables.events(spark, sf), "event_type",
        k = 5, maxItemsTracked = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).toSet == exact.keySet)
    got.foreach { case (item, est, _) => assert(est == exact(item), item) }
    // rank follows descending count
    assert(got.sortBy(_._3).map(_._2).toSeq == got.map(_._2).sorted(Ordering[Long].reverse).toSeq)
  }

  test("sharded accumulate -> combine -> estimate equals the direct sketch") {
    val e = Tables.events(spark, sf)
    val direct = HeavyHitters.topCount(e, "event_type", k = 5, maxItemsTracked = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // shard by day — the persisted-sketch-per-shard pattern
    val sketches = HeavyHitters.accumulateByShard(
      e.withColumn("day", F.to_date(F.col("ts"))), "event_type", "day", maxItemsTracked = 16)
    assert(sketches.count() > 10, "fixture must produce many shards")
    val merged = HeavyHitters.combineEstimate(sketches, "sketch", k = 5, maxItemsTracked = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, "sketch merge across shards must be lossless in the exact regime")
  }

  test("a dominant heavy hitter survives a capacity far below the distinct count") {
    // 5000 distinct rare items + one item at 20% of the stream; track
    // only 64 of ~5001 distinct values
    val rows = (0 until 5000).map(i => s"rare_$i") ++ Seq.fill(1200)("dominant")
    val df = scala.util.Random.shuffle(rows).toDF("tok")
    val got = HeavyHitters.topCount(df, "tok", k = 3, maxItemsTracked = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("dominant"), s"heavy hitter lost: $got")
    assert(got("dominant") >= (1200 * 0.9).toLong,
      s"estimate collapsed: ${got("dominant")}")
  }
}
