package graft

import graft.functions.aggregates
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Bounded top-k aggregates: the payload-carrying form must reproduce
  * the unbounded collect_list∘sort∘slice spelling bit-for-bit — it is
  * the scale-safe replacement for BigQuery ARRAY_AGG(... LIMIT k).
  */
class AggregatesSpec extends SparkSuite {

  test("top_k_payload matches the collect_list reference on orders (incl. serialize/merge path)") {
    val orders = Tables.orders(spark, sf).repartition(7) // force partial buffers to merge across partitions
    val bounded = orders
      .groupBy("o_custkey")
      .agg(aggregates.top_k_payload(
        F.col("o_totalprice"), -F.col("o_orderkey"),
        F.struct(F.col("o_orderkey").as("orderkey"), F.col("o_totalprice").as("price")), 3).as("arr"))
    val reference = orders
      .groupBy("o_custkey")
      .agg(F.slice(F.reverse(F.array_sort(
          F.collect_list(F.struct(F.col("o_totalprice").as("price"), F.col("o_orderkey").as("orderkey"))))), 1, 3)
        .as("raw"))
      .select(F.col("o_custkey"),
        F.transform(F.col("raw"),
          x => F.struct(x.getField("orderkey").as("orderkey"), x.getField("price").as("price"))).as("arr"))
    val a = bounded.orderBy("o_custkey").collect().toSeq
    val b = reference.orderBy("o_custkey").collect().toSeq
    assert(a == b)
  }

  test("top_k_payload keeps ties deterministic and ignores null scores/ids") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double, java.lang.Long, String)](
      (1, 5.0, 10L, "a"), (1, 5.0, 11L, "b"), (1, 5.0, 9L, "c"),
      (1, null, 1L, "dropped-null-score"), (1, 7.0, null, "dropped-null-id"),
      (2, -0.0, 1L, "x"), (2, 0.0, 2L, "y"))
      .toDF("g", "s", "i", "p")
    val out = df.groupBy("g")
      .agg(aggregates.top_k_payload(F.col("s"), F.col("i"), F.col("p"), 2).as("arr"))
      .orderBy("g").collect()
    // group 1: score ties break by id asc -> 9 ("c"), 10 ("a")
    assert(out(0).getSeq[String](1) == Seq("c", "a"))
    // group 2: ±0.0 compare equal (normalized), tie by id asc -> "x", "y"
    assert(out(1).getSeq[String](1) == Seq("x", "y"))
  }

  test("top_k_payload carries null payloads and scalar payload types") {
    import spark.implicits._
    val df = Seq((1, 3.0, 1L, "keep"), (1, 2.0, 2L, null), (1, 1.0, 3L, "drop"))
      .toDF("g", "s", "i", "p")
    val out = df.groupBy("g")
      .agg(aggregates.top_k_payload(F.col("s"), F.col("i"), F.col("p"), 2).as("arr"))
      .collect()
    assert(out(0).getSeq[String](1) == Seq("keep", null))
  }
}
