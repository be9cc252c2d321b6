package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types.StructType

/** Deterministic multi-micro-batch REPLAY of a batch frame — the
  * harness that lets a batch oracle gate a streaming sink end-to-end.
  *
  * [[writeSlices]] writes `splits` single-file parquet slices of a
  * frame (slice i = rows where `sliceExpr = i`) and stamps STRICTLY
  * INCREASING file modification times; FileStreamSource orders its
  * initial listing by modification time (oldest first unless
  * `latestFirst`), so [[readSliced]]'s `maxFilesPerTrigger = 1` stream
  * under `Trigger.AvailableNow` processes exactly `splits`
  * micro-batches in slice-index order, every run. That pins the whole
  * trajectory: a foreachBatch sink driven this way produces one
  * deterministic final state, which a batch SQL oracle can replay —
  * the recipe behind the `stream_*` driver faces (the reference's
  * every-minute ingest loop, idempotent_fx_pipeline.py:75-92, IS this
  * shape: files land, each lands once, state folds forward).
  *
  * The modification-time base is a fixed past epoch, not now():
  * replays must not depend on wall clock, and FileStreamSource
  * processes any pre-existing file regardless of age.
  */
object Replay {

  private val ModTimeBase = 1700000000000L // fixed past epoch (ms)

  /** Write `df` as `splits` single-file slices under `dir`, slice i
    * holding the rows where `sliceExpr === i`, with modification
    * times increasing in i. Returns the written schema (the stream
    * read needs it before the first batch). Rows whose slice value
    * falls outside [0, splits) are REJECTED loudly — silently dropping
    * them would ship a stream that disagrees with the batch oracle.
    *
    * ONE pass over the input (r16 optimization — guide §2.4): the old
    * shape ran `splits` serial filter+coalesce(1) writes plus a
    * validation count = splits+1 full scans. Now a single
    * repartition-by-slice + partitionBy write emits every slice at
    * once — hash partitioning puts each slice value wholly inside one
    * task, so each slice directory holds exactly one part file — and
    * out-of-range/NULL slice rows surface as unexpected partition
    * directories, caught by listing instead of a dedicated scan.
    */
  def writeSlices(df: DataFrame, dir: String, sliceExpr: Column, splits: Int): StructType = {
    require(splits >= 1, s"splits must be >= 1, got $splits")
    val spark = df.sparkSession
    val sliced = df.withColumn("__slice", sliceExpr.cast("int"))
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(hPath)
    val tmp = new org.apache.hadoop.fs.Path(dir, "_tmp_slices")
    sliced.repartition(splits, F.col("__slice"))
      .write.mode("overwrite").partitionBy("__slice").parquet(tmp.toString)
    val sliceDirs = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("__slice="))
      .map(p => p.getName.stripPrefix("__slice=") -> p).toMap
    val strayKeys = sliceDirs.keys.filterNot(v =>
      scala.util.Try(v.toInt).toOption.exists(i => i >= 0 && i < splits)).toSeq.sorted
    if (strayKeys.nonEmpty) {
      // bounded: only the stray directories are read back for the count
      val bad = strayKeys.map { k =>
        spark.read.schema(df.schema).parquet(sliceDirs(k).toString).count()
      }.sum
      throw new IllegalArgumentException(
        s"requirement failed: $bad rows fell outside slices [0, $splits) — " +
          "the replay would lose them")
    }
    for (i <- 0 until splits) {
      val dest = new org.apache.hadoop.fs.Path(dir, f"slice_$i%05d.parquet")
      fs.delete(dest, false)
      sliceDirs.get(i.toString) match {
        case Some(sd) =>
          val part = fs.listStatus(sd).map(_.getPath)
            .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
          require(part.length == 1, s"slice $i: expected one part file, got ${part.length}")
          require(fs.rename(part.head, dest), s"could not place slice file $dest")
        case None =>
          // empty slice: still a real (zero-row) file, so the stream
          // sees exactly `splits` micro-batches like the old writer
          val emptyTmp = new org.apache.hadoop.fs.Path(dir, s"_tmp_empty_$i")
          df.limit(0).coalesce(1).write.mode("overwrite").parquet(emptyTmp.toString)
          val part = fs.listStatus(emptyTmp).map(_.getPath)
            .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
          require(part.length == 1, s"slice $i: expected one part file, got ${part.length}")
          require(fs.rename(part.head, dest), s"could not place slice file $dest")
          fs.delete(emptyTmp, true)
      }
      // strictly increasing, minutes apart — unambiguous ordering even
      // on filesystems with coarse mtime granularity
      fs.setTimes(dest, ModTimeBase + i * 60000L, -1)
    }
    fs.delete(tmp, true)
    df.schema
  }

  /** Stream the sliced directory back, one file (= one slice = one
    * micro-batch) per trigger.
    */
  def readSliced(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
}
