package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.operators.Incremental
import graft.sources.Tables

class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def events = Tables.events(spark, sf)
    .withColumn("day", F.to_date(F.date_trunc("day", F.col("ts"))))
  private val keys = Seq("day", "event_type")

  private def part(b: DataFrame) = Incremental.partials(b, keys, Seq(
    F.sum(F.col("value").cast("decimal(30,2)")).as("value_sum"),
    F.count(F.lit(1)).as("n_cnt"),
    F.min(F.col("value")).as("value_min"),
    F.max(F.col("value")).as("value_max")))

  private def canon(df: DataFrame) =
    df.orderBy(keys.map(F.col): _*).collect().map(_.toSeq).toSeq

  test("merge chain over disjoint batches equals the single-pass aggregate, any split") {
    val whole = part(events)
    for (splits <- Seq(2, 5)) {
      val merged = Incremental.mergeAll(
        (0 until splits).map(i => part(events.filter(F.pmod(F.col("event_id"), F.lit(splits)) === i))),
        keys)
      assert(canon(merged) == canon(whole), s"splits=$splits")
      // names + types must not drift across merges (nullability widens
      // by the left join — immaterial to persisted parquet state)
      assert(merged.schema.map(f => (f.name, f.dataType)) ==
        whole.schema.map(f => (f.name, f.dataType)), s"schema drift at splits=$splits")
    }
  }

  test("merge is order-insensitive and keeps untouched state rows bit-identical") {
    val parts = (0 until 3).map(i => part(events.filter(F.pmod(F.col("event_id"), F.lit(3)) === i)))
    assert(canon(Incremental.mergeAll(parts, keys)) == canon(Incremental.mergeAll(parts.reverse, keys)))
    // a delta touching one event_type leaves every other state row as-is
    val state = part(events.filter(F.col("event_id") % 2 === 0))
    val delta = part(events.filter(F.col("event_id") % 2 === 1 && F.col("event_type") === "purchase"))
    val merged = Incremental.merge(state, delta, keys)
    val untouchedBefore = canon(state.filter(F.col("event_type") =!= "purchase"))
    val untouchedAfter = canon(merged.filter(F.col("event_type") =!= "purchase"))
    assert(untouchedBefore == untouchedAfter)
  }

  test("delta-only keys are inserted; null group keys merge as one group") {
    val a = Seq((Some("k1"), 1L, 10L), (Option.empty[String], 1L, 5L)).toDF("k", "n_cnt", "v_sum")
    val b = Seq((Some("k2"), 2L, 20L), (Option.empty[String], 3L, 7L)).toDF("k", "n_cnt", "v_sum")
    val m = Incremental.merge(a, b, Seq("k")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(m == Set((Some("k1"), 1L, 10L), (Some("k2"), 2L, 20L), (None, 4L, 12L)))
  }

  test("a measure column without a mergeable suffix is rejected") {
    val a = Seq(("k", 1L)).toDF("k", "bogus")
    intercept[IllegalArgumentException] { Incremental.merge(a, a, Seq("k")) }
  }

  test("broadcastDelta=false: bit-identical result via a shuffle join, no broadcast of the delta") {
    val state = part(events.filter(F.col("event_id") % 2 === 0))
    val delta = part(events.filter(F.col("event_id") % 2 === 1))
    val viaBroadcast = Incremental.merge(state, delta, keys)
    val viaShuffle = Incremental.merge(state, delta, keys, broadcastDelta = false)
    assert(canon(viaBroadcast) == canon(viaShuffle))
    assert(viaShuffle.schema == viaBroadcast.schema)
    // the combine half must not plan a BroadcastHashJoin when disabled
    val plan = viaShuffle.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffled combine join:\n${plan.take(1200)}")
    // the chain face accepts the flag too
    val parts = (0 until 3).map(i => part(events.filter(F.pmod(F.col("event_id"), F.lit(3)) === i)))
    assert(canon(Incremental.mergeAll(parts, keys, broadcastDelta = false)) ==
      canon(Incremental.mergeAll(parts, keys)))
  }

  test("the state payload is never shuffled: combine half is a broadcast hash join") {
    val parts = (0 until 2).map(i => part(events.filter(F.pmod(F.col("event_id"), F.lit(2)) === i)))
    val merged = Incremental.merge(parts(0), parts(1), keys)
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("mergeAll with durable staging: same result, stages rotate, last stage survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mergeall-").toString
    val parts = (0 until 3).map(i => part(events.filter(F.pmod(F.col("event_id"), F.lit(3)) === i)))
    val staged = Incremental.mergeAll(parts, keys, stagingDir = Some(dir))
    assert(canon(staged) == canon(Incremental.mergeAll(parts, keys)))
    // intermediates dropped, the last fold's stage backs the result
    val stages = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(stages == Set("state-2"), s"got $stages")
    graft.operators.Staging.drop(spark, dir)
  }

  test("HLL state: split-merged estimate equals the single-pass estimate and tracks exact distincts") {
    def hpart(b: DataFrame) = Incremental.partials(b, Seq("event_type"), Seq(
      F.hll_sketch_agg(F.col("user_id"), 14).as("users_hll"),
      F.count(F.lit(1)).as("n_cnt")))
    val whole = hpart(events)
      .select(F.col("event_type"), F.hll_sketch_estimate(F.col("users_hll")).as("est"))
    val merged = Incremental.mergeAll(
      (0 until 4).map(i => hpart(events.filter(F.pmod(F.col("event_id"), F.lit(4)) === i))),
      Seq("event_type"))
      .select(F.col("event_type"), F.hll_sketch_estimate(F.col("users_hll")).as("est"))
    // HLL register-max is commutative and idempotent: same final state
    assert(canon2(merged) == canon2(whole))
    val exact = events.groupBy("event_type").agg(F.countDistinct("user_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.collect().foreach { r =>
      val (t, est) = (r.getString(0), r.getLong(1))
      assert(math.abs(est - exact(t)).toDouble / exact(t) < 0.05, s"$t: est=$est exact=${exact(t)}")
    }
  }

  private def canon2(df: DataFrame) =
    df.orderBy("event_type").collect().map(_.toSeq).toSeq
}
