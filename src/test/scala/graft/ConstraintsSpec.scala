package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Constraints
import graft.operators.Constraints._
import graft.sources.Tables

class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private val dirty = Seq(
    (Some(1L), Some(10.0), "a"),
    (Some(2L), Some(20.0), "b"),
    (Some(2L), Some(-5.0), "c"), // duplicate key + below range
    (None, Some(999.0), "d"),    // null key + above range
    (Some(4L), None, "e")        // null value (not a range violation)
  ).map { case (k, v, s) => (k.map(Long.box).orNull, v.map(Double.box).orNull, s) }
    .toDF("k", "v", "s")

  test("each rule counts exactly its violations") {
    val report = Constraints.check(dirty, Seq(
      NotNull("k"), NotNull("v"),
      InRange("v", 0.0, 100.0),
      Unique(Seq("k")),
      Satisfies("s_nonempty", F.length(F.col("s")) > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(report("not_null(k)") == 1)
    assert(report("not_null(v)") == 1)
    assert(report("in_range(v,0.0,100.0)") == 2) // -5 and 999; the NULL is NotNull's
    assert(report("unique(k)") == 2)             // both rows on key 2; null key skipped
    assert(report("satisfies(s_nonempty)") == 0)
  }

  test("satisfies treats NULL predicates as violations") {
    val df = Seq((Some(1.0), "x"), (None, "y")).map { case (v, s) => (v.map(Double.box).orNull, s) }
      .toDF("v", "s")
    val report = Constraints.check(df, Seq(Satisfies("v_pos", F.col("v") > 0)))
      .collect()
    assert(report.head.getLong(1) == 1, "NULL > 0 is unprovable -> violation")
  }

  test("referential integrity counts orphans; null FKs are skipped") {
    val facts = Seq((Some(1L), "x"), (Some(99L), "orphan"), (None, "nullfk"))
      .map { case (k, s) => (k.map(Long.box).orNull, s) }.toDF("fk", "s")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("pk", "name")
    val report = Constraints.check(facts, Seq(RefIntegrity(Seq("fk"), dim, Seq("pk"))))
      .collect()
    assert(report.head.getLong(1) == 1)
  }

  test("assertAll throws with the full report on dirty data, passes on clean") {
    val e = intercept[IllegalStateException] {
      Constraints.assertAll(dirty, Seq(NotNull("k"), Unique(Seq("k"))))
    }
    assert(e.getMessage.contains("not_null(k)=1") && e.getMessage.contains("unique(k)=2"))
    Constraints.assertAll(Tables.orders(spark, sf), Seq(
      NotNull("o_orderkey"), Unique(Seq("o_orderkey")),
      RefIntegrity(Seq("o_custkey"), Tables.customer(spark, sf), Seq("c_custkey"))))
  }

  test("row-local rules share ONE scan of the table") {
    val report = Constraints.check(Tables.orders(spark, sf), Seq(
      NotNull("o_custkey"), InRange("o_totalprice", 0.0, 1e6),
      Satisfies("status", F.col("o_orderstatus").isin("F", "O", "P"))))
    val plan = report.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan for 3 row-local rules, got $scans:\n${plan.take(1500)}")
  }

  test("violations returns the offending rows for debugging") {
    val rows = Constraints.violations(dirty, InRange("v", 0.0, 100.0))
      .select("s").as[String].collect().toSet
    assert(rows == Set("c", "d"))
  }

  test("duplicate rule names reject loudly (each name is a report row)") {
    val e = intercept[IllegalArgumentException] {
      Constraints.check(dirty, Seq(
        Satisfies("pos", F.col("v") > 0), Satisfies("pos", F.col("k") > 0)))
    }
    assert(e.getMessage.contains("satisfies(pos)"))
  }

  test("empty table: zero violations everywhere") {
    val empty = dirty.filter(F.lit(false))
    val report = Constraints.check(empty, Seq(NotNull("k"), Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(report.values.forall(_ == 0L))
  }

  test("annotate blames each row with exactly the rules it breaks, map-only") {
    val rules = Seq(NotNull("k"), NotNull("v"), InRange("v", 0.0, 100.0))
    val out = Constraints.annotate(dirty, rules)
    val byS = out.collect().map(r =>
      r.getString(2) -> r.getSeq[String](3).toSet).toMap
    assert(byS("a") == Set.empty[String] && byS("b") == Set.empty[String])
    assert(byS("c") == Set("in_range(v,0.0,100.0)"))
    assert(byS("d") == Set("not_null(k)", "in_range(v,0.0,100.0)"))
    assert(byS("e") == Set("not_null(v)"))
    // per-row blame sums to the report's counts
    val report = Constraints.check(dirty, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val blamed = out.select(F.explode(F.col("violated")).as("rule"))
      .groupBy("rule").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(blamed == report.filter(_._2 > 0))
    // map-only: the annotation must not shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"annotate must be map-only:\n${plan.take(800)}")
    // structural rules have no per-row blame
    intercept[IllegalArgumentException] {
      Constraints.annotate(dirty, Seq(Unique(Seq("k"))))
    }
    intercept[IllegalArgumentException] {
      Constraints.annotate(dirty.withColumn("violated", F.lit(1)), Seq(NotNull("k")))
    }
  }
}
