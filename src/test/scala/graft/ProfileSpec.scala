package graft

import graft.operators.Profile
import graft.sources.Tables

class ProfileSpec extends SparkSuite {

  test("approx profile tracks the exact profile: counts equal, distincts within 10%") {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val exact = Profile.columnsExact(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val approx = Profile.columns(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(exact.keySet == approx.keySet)
    for ((col, (n, nulls, dist)) <- exact) {
      val (an, anulls, adist) = approx(col)
      assert(an == n && anulls == nulls, s"$col: exact counts must agree")
      assert(math.abs(adist - dist) <= math.max(1L, (dist * 0.10).toLong),
        s"$col: approx distinct $adist vs exact $dist drifts >10%")
    }
  }

  test("approx profile plan has no Expand (the scale rationale for the split)") {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    assert(!Profile.columns(df).queryExecution.executedPlan.toString.contains("Expand"))
    assert(Profile.columnsExact(df).queryExecution.executedPlan.toString.contains("Expand"))
  }
}
