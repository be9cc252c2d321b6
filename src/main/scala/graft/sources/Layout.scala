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

  /** Compact the small files that O(batch) appends accumulate. A
    * 5-minute ingest cadence writes ~288 files per day partition; at
    * 100 TB that is millions of sub-row-group files whose open/footer
    * costs dominate scans. Rewrites ONLY day partitions holding more
    * than `maxFilesPerDay` files — read with partition pruning,
    * re-sorted on `clusterCols` (appends are sorted per-file only;
    * compaction restores the per-day sort and with it the min/max
    * row-group pruning A8 promises), committed via dynamic partition
    * overwrite so untouched days never rewrite and a mid-job crash
    * leaves the original files in place (staging commit).
    *
    * Returns the compacted day values. Driver-side work is one
    * partition-directory listing — O(days), metadata only.
    */
  def compactDays(spark: org.apache.spark.sql.SparkSession, path: String,
                  clusterCols: Seq[String], maxFilesPerDay: Int = 8): Seq[String] = {
    require(maxFilesPerDay >= 1, s"maxFilesPerDay must be >= 1, got $maxFilesPerDay")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val crowded = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_day="))
      .map { d =>
        val files = fs.listStatus(d.getPath).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
        d.getPath.getName.stripPrefix("p_day=") -> files
      }
      // a null-day partition (__HIVE_DEFAULT_PARTITION__, e.g. rows
      // whose nullable ts loaded as null) is not date-addressable by
      // the overwrite filter — skip it rather than crash every
      // subsequent compaction run on Date.valueOf
      .collect { case (day, n) if n > maxFilesPerDay &&
        scala.util.Try(java.sql.Date.valueOf(day)).isSuccess => day }
    if (crowded.isEmpty) return Nil
    withDynamicPartitionOverwrite(spark) {
      spark.read.parquet(path)
        .filter(F.col("p_day").isInCollection(crowded.map(java.sql.Date.valueOf)))
        // Spark (rightly) refuses to overwrite a path its plan reads
        // from; localCheckpoint truncates the lineage to executor-held
        // blocks. Only the crowded days materialize — bounded per run —
        // and a failure before the commit leaves every original file in
        // place (compaction is idempotent: just re-run).
        .localCheckpoint()
        .repartition(F.col("p_day"))
        .sortWithinPartitions(clusterCols.map(F.col): _*)
        .write.mode("overwrite").partitionBy("p_day").parquet(path)
    }
    spark.catalog.refreshByPath(path)
    crowded
  }

  /** Run `body` with dynamic partition-overwrite mode, restoring the
    * previous session setting afterwards.
    */
  private def withDynamicPartitionOverwrite(
      spark: org.apache.spark.sql.SparkSession)(body: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Replace ONLY the day partitions present in `df`, leaving all other
    * days untouched — the reference's per-day WRITE_TRUNCATE
    * disposition ("latest analysis of the day overwrites previous",
    * reference README.md), done safely at table scale with dynamic
    * partition overwrite instead of a full-table truncate.
    */
  def overwriteDayPartitions(df: DataFrame, path: String, tsCol: String): Unit =
    withDynamicPartitionOverwrite(df.sparkSession) {
      df.withColumn("p_day", F.to_date(F.col(tsCol)))
        .repartition(F.col("p_day"))
        .write.mode("overwrite").partitionBy("p_day").parquet(path)
    }
}
