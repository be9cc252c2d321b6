package graft.sources

import org.apache.spark.sql.{DataFrame, functions => F}

/** Physical-layout operator (SURVEY.md §2 A8): the reference README's
  * "partition by DATE(date), cluster by (from_cur,to_cur)" advice,
  * re-expressed as Spark table layout. Day-partitioned directories
  * give partition pruning on date filters; sorting within partitions
  * gives parquet min/max row-group pruning on the cluster keys —
  * the same two effects BigQuery partitioning + clustering buy.
  */
object Layout {

  /** Write `df` day-partitioned on `tsCol` and sorted by `clusterCols`
    * within each partition. `repartition` on the partition value keeps
    * one shuffle task per day-file set (avoids the classic
    * every-task-writes-every-partition small-files explosion).
    */
  def writePartitioned(df: DataFrame, path: String, tsCol: String,
                       clusterCols: Seq[String]): Unit =
    df.withColumn("p_day", F.to_date(F.col(tsCol)))
      .repartition(F.col("p_day"))
      .sortWithinPartitions(clusterCols.map(F.col): _*)
      .write.mode("overwrite").partitionBy("p_day").parquet(path)

  /** Append `df` as NEW files into an existing day-partitioned layout,
    * leaving every existing file untouched — the reference's
    * WRITE_APPEND disposition. Cost is O(batch) regardless of table
    * size; combined with a keyed anti-join upstream this is the
    * idempotent-ingest write path that survives 100 TB (a rewrite of
    * the full table per micro-batch would be O(table)).
    */
  def appendPartitioned(df: DataFrame, path: String, tsCol: String,
                        clusterCols: Seq[String]): Unit =
    df.withColumn("p_day", F.to_date(F.col(tsCol)))
      .repartition(F.col("p_day"))
      .sortWithinPartitions(clusterCols.map(F.col): _*)
      .write.mode("append").partitionBy("p_day").parquet(path)

  /** Write `df` hash-BUCKETED on `bucketCols` (and sorted inside each
    * bucket) as an external table at `path`. Two tables bucketed the
    * same way on the join key co-locate: Spark plans their join with
    * NO shuffle exchange on either side — at 100 TB this turns the
    * nightly fact⋈fact join from two full-table shuffles into a
    * map-side merge. The bucket count is part of the physical
    * contract: pick it once per table family (same count both sides)
    * and size it so a bucket fits an executor core's memory.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Replace ONLY the day partitions present in `df`, leaving all other
    * days untouched — the reference's per-day WRITE_TRUNCATE
    * disposition ("latest analysis of the day overwrites previous",
    * reference README.md), done safely at table scale with dynamic
    * partition overwrite instead of a full-table truncate.
    */
  def overwriteDayPartitions(df: DataFrame, path: String, tsCol: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.withColumn("p_day", F.to_date(F.col(tsCol)))
        .repartition(F.col("p_day"))
        .write.mode("overwrite").partitionBy("p_day").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
