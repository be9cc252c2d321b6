package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.operators.Upsert
import graft.sources.{Layout, Tables}

/** The reference's two DAGs, end-to-end, as one composable library
  * pipeline (SURVEY.md §1) — what an Airflow task would call per run:
  *
  *  DAG 1 (`FXRate_Reporting_Pipeline`): fetch JSON → typed rows →
  *  idempotent load into the raw table
  *  (idempotent_fx_pipeline.py:24-115).
  *  DAG 2 (`FXRate_Reporting_Pipeline_v2`): aggregate per day → MERGE
  *  into the report table (fx_pipeline_with_merge.py:147-211).
  *
  * External orchestration (Airflow/cron) just invokes `ingest` and
  * `report` on a schedule; all state lives in the day-partitioned
  * parquet tables, so every run is idempotent and re-runnable — the
  * property the reference implements three different ways.
  *
  * Each stage is wrapped in `observe` so row counts surface as query
  * metrics (the Spark-native form of the reference's per-step
  * logging.info counts).
  */
object FxPipeline {

  /** Parse a raw JSON-ish batch (here: the events feed) into the typed
    * rate schema and idempotently append into `rawPath` (day-keyed
    * anti-join; re-delivered rows are dropped).
    */
  def ingest(spark: SparkSession, batch: DataFrame, rawPath: String): DataFrame = {
    val typed = batch.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").as("rate"))
      .observe("fx_ingest", F.count(F.lit(1)).as("batch_rows"))
    val existing = readTableIfExists(spark, rawPath)
    val merged = existing match {
      case Some(t) => Upsert.idempotentAppend(t.drop("p_day"), typed, Seq("event_id"))
      case None    => typed
    }
    stageAndSwap(rawPath)(Layout.writePartitioned(merged, _, "ts", Seq("event_type", "user_id")))
    spark.read.parquet(rawPath)
  }

  /** First-run detection must be precise: treating ANY read failure as
    * "table absent" would let a transient error (permissions, corrupt
    * footer, interrupted swap) silently replace the full table with
    * one batch. Only a genuinely missing path qualifies; everything
    * else propagates.
    */
  private def readTableIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (new java.io.File(path).exists()) Some(spark.read.parquet(path)) else None

  /** Write to a staging directory then swap — a lazily-planned merge
    * reads the very files an in-place overwrite deletes (the reference
    * hits the same hazard and stages through temp BigQuery tables;
    * a table format with snapshot isolation subsumes this on a real
    * deployment).
    */
  private def stageAndSwap(path: String)(write: String => Unit): Unit = {
    val staging = path + ".staging"
    write(staging)
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (dir.exists()) rm(dir)
    if (!new java.io.File(staging).renameTo(dir))
      throw new java.io.IOException(s"swap failed: $staging -> $path")
    // drop the session-wide cached file listing for the swapped path
    org.apache.spark.sql.SparkSession.active.catalog.refreshByPath(path)
  }

  /** Per-day averages MERGE'd into the report table — only the days
    * present in the new aggregate are rewritten (dynamic partition
    * overwrite = the reference's "latest analysis of the day
    * overwrites previous").
    */
  def report(spark: SparkSession, rawPath: String, reportPath: String): DataFrame = {
    val raw = spark.read.parquet(rawPath)
    val agg = raw
      .groupBy(F.to_date(F.col("ts")).as("day"), F.col("event_type"))
      .agg(F.avg("rate").as("avg_rate"), F.count(F.lit(1)).as("n"))
      .withColumn("ts", F.col("day").cast("timestamp"))
      .observe("fx_report", F.count(F.lit(1)).as("report_rows"))
    val existing = readTableIfExists(spark, reportPath).map(_.drop("p_day"))
    val merged = existing match {
      case Some(t) => Upsert.merge(t, agg, Seq("day", "event_type"))
      case None    => agg
    }
    stageAndSwap(reportPath)(Layout.writePartitioned(merged, _, "ts", Seq("event_type")))
    spark.read.parquet(reportPath)
  }
}
