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
    * else propagates. Existence goes through the Hadoop FileSystem API
    * so hdfs:///s3a:// paths resolve correctly, not just local ones.
    */
  private def readTableIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** Write to a staging directory then swap — a lazily-planned merge
    * reads the very files an in-place overwrite deletes (the reference
    * hits the same hazard and stages through temp BigQuery tables;
    * a table format with snapshot isolation subsumes this on a real
    * deployment).
    */
  private def stageAndSwap(path: String)(write: String => Unit): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    val retired = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    write(staging.toString)
    // retire-then-promote: the live table is renamed aside (not deleted)
    // before the staging copy moves in, so a failure at any step leaves
    // at least one complete copy on disk
    if (fs.exists(retired)) fs.delete(retired, true)
    val hadOld = fs.exists(target)
    if (hadOld && !fs.rename(target, retired))
      throw new java.io.IOException(s"could not retire $path")
    if (!fs.rename(staging, target)) {
      if (hadOld) fs.rename(retired, target) // roll back
      throw new java.io.IOException(s"swap failed: $staging -> $path")
    }
    if (hadOld) fs.delete(retired, true)
    // drop the session-wide cached file listing for the swapped path
    spark.catalog.refreshByPath(path)
  }

  /** Per-day averages MERGE'd into the report table. The merged result
    * covers every day, so the whole (small — one row per day×type)
    * report table is rewritten via stage-and-swap; a raw-sized table
    * would instead aggregate only fresh days and route through
    * `Layout.overwriteDayPartitions` to rewrite O(changed days).
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
