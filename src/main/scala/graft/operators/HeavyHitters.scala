package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Approximate heavy hitters — the BigQuery `APPROX_TOP_COUNT`
  * surface (the reference's users profile categorical hot keys with
  * it) on Spark 4.1's native `approx_top_k` sketch aggregate.
  *
  * Scale shape: the sketch is a bounded-size mergeable aggregation
  * buffer (`maxItemsTracked` entries), so the plan is one map-side
  * partial sketch per partition + one merge exchange — no per-item
  * shuffle, no global sort. When the true distinct count of the
  * column is ≤ `maxItemsTracked` the counts are EXACT (that regime is
  * what the DuckDB oracle pins); above it, estimates come with the
  * sketch's error bound and the top of the distribution stays
  * reliable — at 100 TB you size `maxItemsTracked` to the head you
  * care about (10⁴–10⁵ entries is a few MB of executor memory),
  * never to the vocabulary.
  */
object HeavyHitters {

  /** Top-k items of `col` by (approximate) count:
    * (item, count_est, rank). `rank` is the sketch's descending-count
    * order; ties within equal counts are not deterministic — callers
    * feeding a hash-compare should re-sort on (count_est, item).
    */
  def topCount(df: DataFrame, col: String, k: Int,
               maxItemsTracked: Int = 10000): DataFrame =
    df.select(F.expr(s"approx_top_k(`$col`, $k, $maxItemsTracked)").as("tk"))
      .select(F.posexplode(F.col("tk")).as(Seq("r", "s")))
      .select(F.col("s.item").as("item"), F.col("s.count").as("count_est"),
        (F.col("r") + 1).as("rank"))

  /** One reusable sketch per shard (`approx_top_k_accumulate`) — the
    * incremental-corpus pattern: persist per-shard sketches (a few MB
    * each) and answer "top tokens this month" by combining shards,
    * never rescanning the corpus.
    */
  def accumulateByShard(df: DataFrame, col: String, shardCol: String,
                        maxItemsTracked: Int = 10000): DataFrame =
    df.groupBy(F.col(shardCol).as("shard"))
      .agg(F.expr(s"approx_top_k_accumulate(`$col`, $maxItemsTracked)").as("sketch"))

  /** Merge previously accumulated sketches and extract the top-k:
    * (item, count_est, rank). Combining is associative — any subset of
    * shards, any order.
    */
  def combineEstimate(sketches: DataFrame, sketchCol: String, k: Int,
                      maxItemsTracked: Int = 10000): DataFrame =
    sketches
      .agg(F.expr(s"approx_top_k_estimate(approx_top_k_combine(`$sketchCol`, $maxItemsTracked), $k)").as("tk"))
      .select(F.posexplode(F.col("tk")).as(Seq("r", "s")))
      .select(F.col("s.item").as("item"), F.col("s.count").as("count_est"),
        (F.col("r") + 1).as("rank"))
}
