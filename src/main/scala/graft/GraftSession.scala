package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for correctness-parity with the DuckDB oracle (UTC timezone)
  * and for scale (AQE on, shuffle partitions sized to the machine
  * rather than Spark's default 200). ANSI mode stays at the Spark 4
  * default (ON): overflow and invalid casts throw instead of silently
  * nulling — the same strictness the DuckDB oracle applies. On a real
  * cluster the same builder applies — only master/partitions change.
  */
object GraftSession {
  def builder(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as epoch-nanos long and convert in the loader.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val spark = builder(cpus).master(s"local[$cpus]").getOrCreate()
    graft.functions.SqlFunctions.register(spark)
    spark
  }
}
