package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSuite {

  test("saltedJoin is result-identical to the plain join") {
    val fact = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .select(F.col("c_custkey").as("o_custkey"), F.col("c_nationkey"), F.col("c_name"))
    val plain = fact.join(dim, Seq("o_custkey"))
    val salted = Skew.saltedJoin(fact, dim, Seq("o_custkey"), salts = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    // full multiset equality via a per-row signature
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(F.md5(F.concat_ws(1.toChar.toString, df.columns.map(c => F.col(c).cast("string")): _*)).as("h"))
        .groupBy("h").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sig(salted) == sig(plain))
  }

  test("saltedJoin spreads a hot key over multiple reducers") {
    import spark.implicits._
    // 90%-one-key fact side, spread over input partitions
    val fact = ((1 to 9000).map(i => (42L, i)) ++ (1 to 1000).map(i => (i.toLong % 50, -i)))
      .toDF("k", "payload").repartition(16)
    val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salts = 8
    // the pre-join salted fact carries >1 distinct salt for the hot key
    val salted = fact.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(salts)))
    val hotSalts = salted.filter(F.col("k") === 42L).select("__salt").distinct().count()
    assert(hotSalts >= salts / 2, s"hot key landed on only $hotSalts salts")
    // and the join still returns exactly one dim match per fact row
    val joined = Skew.saltedJoin(fact, dim, Seq("k"), salts)
    assert(joined.count() == fact.count())
    assert(joined.filter(F.col("k") === 42L).select("name").distinct().count() == 1)
  }

  test("AQE splits a skewed sort-merge join at runtime (the planner-side complement)") {
    import spark.implicits._
    // Skew.saltedJoin's scaladoc routes sort-merge-joinable skew to
    // AQE; this pins that the session's AQE config actually fires.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = ((1 to 200000).map(i => (42L, i.toLong)) ++
        (1 to 20000).map(i => (i.toLong % 200, i.toLong))).toDF("k", "lv")
      val right = (0L to 200L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's own query execution, so its
      // AdaptiveSparkPlan finalizes (a write/count would execute a copy)
      assert(joined.collect().length == left.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-key join skewed:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
