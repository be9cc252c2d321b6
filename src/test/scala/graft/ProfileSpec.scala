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

  test("approx percentiles track exact percentiles within quantile-rank tolerance") {
    val exact = SparkEntry.queries("q_percentile")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val approx = SparkEntry.queries("q_percentile_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(exact.keySet == approx.keySet)
    for ((tpe, (p25, p50, p90, n)) <- exact) {
      val (a25, a50, a90, an) = approx(tpe)
      assert(an == n, s"$tpe: counts must agree exactly")
      // accuracy=10000 bounds rank error to n/10000 positions; translate
      // to a value tolerance via the group's value spread per rank
      val spread = math.max(1e-9, (p90 - p25) / 0.65) // spread per unit quantile
      val tol = math.max(1e-6, spread * math.max(1.0, n / 10000.0) / n * 4)
      for (((e, a), q) <- Seq((p25, a25), (p50, a50), (p90, a90)).zip(Seq("p25", "p50", "p90")))
        assert(math.abs(a - e) <= math.max(tol, math.abs(e) * 0.02),
          s"$tpe/$q: approx $a vs exact $e drifts beyond tolerance")
    }
  }

  test("approx percentile buffers are bounded (ApproximatePercentile, not Percentile)") {
    val plan = SparkEntry.queries("q_percentile_approx")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"))
    assert(!SparkEntry.queries("q_percentile_approx")(spark, sf)
      .queryExecution.optimizedPlan.toString.matches("(?s).*\\bpercentile\\(.*"))
  }

  test("approx profile plan has no Expand (the scale rationale for the split)") {
    val df = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    assert(!Profile.columns(df).queryExecution.executedPlan.toString.contains("Expand"))
    assert(Profile.columnsExact(df).queryExecution.executedPlan.toString.contains("Expand"))
  }
}
