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
      df.select(F.md5(F.concat_ws("", df.columns.map(c => F.col(c).cast("string")): _*)).as("h"))
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
}
