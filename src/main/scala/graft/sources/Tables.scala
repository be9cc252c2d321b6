package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test-data star schema + events/documents/embeddings.
  *
  * Each table is a single parquet file per scale factor; on a real
  * deployment these would be partitioned directories — the API is the
  * same. Loading stays fully declarative so Catalyst can push filters
  * and prune columns into the parquet scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives as either parquet TIMESTAMP(NANOS) — which
    * Spark reads as an epoch-nanos long under
    * spark.sql.legacy.parquet.nanosAsLong=true — or plain
    * timestamp[us] without timezone, which Spark reads as
    * TIMESTAMP_NTZ. Both normalize to the session TIMESTAMP type so
    * downstream `unix_micros`/date arithmetic resolves: nanos truncate
    * to micros (the same truncation DuckDB applies casting
    * TIMESTAMP_NS → TIMESTAMP), and NTZ casts under the session's UTC
    * zone — value-preserving, matching DuckDB's naive-as-UTC reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` on longs coerces to double, whose 53-bit
        // mantissa cannot represent 2024-epoch nanos (ULP = 256 ns) — that
        // lands ~2% of rows on the wrong microsecond
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
