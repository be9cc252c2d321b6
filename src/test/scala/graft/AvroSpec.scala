package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{functions => F, Row, SaveMode}
import org.apache.spark.sql.types._

/** The graft-avro DSv2 bridge (sources/AvroSource.scala): typed
  * round-trips, null handling, nested/array/map/decimal payloads,
  * split reads, column pruning, and the three SQL statements that
  * dispatch AVRO (EXTERNAL TABLE / EXPORT DATA / LOAD DATA).
  */
class AvroSpec extends SparkSuite {
  import spark.implicits._

  private def dir(): String = Files.createTempDirectory("graft-avro-").toString

  test("flat-type round-trip: long/int/double/float/bool/string/binary/date/timestamp/decimal + nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType), StructField("d", DoubleType),
      StructField("f", FloatType), StructField("b", BooleanType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(20, 4))))
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, true, "hej", Array[Byte](1, 2, 3),
        Date.valueOf("2024-03-01"), Timestamp.valueOf("2024-03-01 10:30:00.123456"),
        new java.math.BigDecimal("12345.6789")),
      Row(2L, null, null, null, null, null, null, null, null, null),
      Row(3L, -1, -0.25, 0f, false, "", Array.empty[Byte],
        Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.0"),
        new java.math.BigDecimal("-0.0001")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val d = dir()
    df.write.format("graft-avro").mode(SaveMode.Append).save(d)
    val back = spark.read.format("graft-avro").load(d)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length == 3)
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
          case (a, b) => assert(a == b, s"col ${schema(i).name}: $a != $b")
        }
      }
    }
  }

  test("nested struct / array / map round-trip, including nullable struct fields") {
    val d = dir()
    val df = Seq(
      (1L, Seq(1, 2, 3), Map("a" -> 1.5, "b" -> 2.5), ("x", 10L)),
      (2L, Seq.empty[Int], Map.empty[String, Double], ("y", -1L)))
      .toDF("id", "arr", "m", "st")
    df.write.format("graft-avro").mode(SaveMode.Append).save(d)
    val back = spark.read.format("graft-avro").load(d).orderBy("id")
    val r = back.collect()
    assert(r(0).getSeq[Int](1) == Seq(1, 2, 3))
    assert(r(0).getMap[String, Double](2) == Map("a" -> 1.5, "b" -> 2.5))
    assert(r(0).getStruct(3).getString(0) == "x" && r(0).getStruct(3).getLong(1) == 10L)
    assert(r(1).getSeq[Int](1).isEmpty && r(1).getMap[String, Double](2).isEmpty)
    // null array elements and a NULL struct survive
    val d2 = dir()
    val schema2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("arr", ArrayType(StringType, containsNull = true)),
      StructField("st", StructType(Seq(StructField("a", LongType))))))
    val rows2 = Seq(Row(1L, Seq("x", null, "z"), Row(5L)), Row(2L, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows2, 1), schema2)
      .write.format("graft-avro").mode(SaveMode.Append).save(d2)
    val b2 = spark.read.format("graft-avro").load(d2).orderBy("id").collect()
    assert(b2(0).getSeq[String](1) == Seq("x", null, "z"))
    assert(b2(0).getStruct(2).getLong(0) == 5L)
    assert(b2(1).isNullAt(1) && b2(1).isNullAt(2))
  }

  test("split reads cover every row exactly once; column pruning prunes") {
    val d = dir()
    val df = spark.range(0, 20000).select(
      F.col("id"), F.concat(F.lit("pad-pad-pad-"), F.col("id")).as("s"),
      (F.col("id") * 2).as("v"))
    df.coalesce(1).write.format("graft-avro")
      .option("compression", "none").mode(SaveMode.Append).save(d)
    // force many sub-file splits: ranges land mid-block and the sync
    // discipline must neither drop nor duplicate
    val back = spark.read.format("graft-avro").option("maxPartitionBytes", "4096").load(d)
    assert(back.rdd.getNumPartitions > 5, "expected multiple splits of one file")
    assert(back.count() == 20000L)
    assert(back.agg(F.sum("id")).head().getLong(0) == (0L until 20000L).sum)
    // pruning: only requested columns decode (plan-level check)
    val plan = back.select("v").queryExecution.executedPlan.toString
    assert(!plan.contains("pad"), s"unexpected full-width scan:\n$plan")
    assert(back.select(F.sum("v")).head().getLong(0) == (0L until 20000L).map(_ * 2).sum)
  }

  test("glob reads skip hidden files: .inprogress shards and _SUCCESS never surface") {
    val d = dir()
    spark.range(0, 10).coalesce(1).write.format("graft-avro")
      .mode(SaveMode.Append).save(d)
    // plant a hidden in-progress shard (valid avro bytes, hidden name)
    // and a _SUCCESS marker — a dir/* glob must read NEITHER, or the
    // streaming publish-at-commit watermark breaks mid-epoch
    val visible = new java.io.File(d).listFiles().filter(_.getName.endsWith(".avro")).head
    val bytes = java.nio.file.Files.readAllBytes(visible.toPath)
    java.nio.file.Files.write(java.nio.file.Paths.get(d, ".inprogress-e0-part.avro"), bytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "_SUCCESS"), Array.empty[Byte])
    assert(spark.read.format("graft-avro").load(s"$d/*").count() == 10L,
      "glob read surfaced a hidden file")
    // directory listing agrees (the long-standing invariant)
    assert(spark.read.format("graft-avro").load(d).count() == 10L)
    // an EXPLICITLY named visible file still reads verbatim
    assert(spark.read.format("graft-avro").load(visible.toString).count() == 10L)
  }

  test("EXPORT DATA / CREATE EXTERNAL TABLE / LOAD DATA speak AVRO end-to-end") {
    val base = dir()
    spark.range(0, 100).select(F.col("id"),
      F.concat(F.lit("r"), F.col("id")).as("name"),
      (F.col("id") % 7).cast("double").as("score"))
      .createOrReplaceTempView("avro_src")
    // EXPORT
    GraftSql.load(spark,
      s"EXPORT DATA OPTIONS(uri='$base/out/shard-*.avro', format='AVRO') AS " +
        "SELECT * FROM avro_src")
    val files = new java.io.File(s"$base/out").listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty, "EXPORT DATA must land .avro shards")
    // non-overwrite export never clobbers
    assert(intercept[IllegalArgumentException] {
      GraftSql.load(spark,
        s"EXPORT DATA OPTIONS(uri='$base/out/shard-*.avro', format='AVRO') AS " +
          "SELECT * FROM avro_src")
    }.getMessage.contains("never"))
    // EXTERNAL TABLE over the export
    GraftSql.load(spark,
      s"CREATE EXTERNAL TABLE avro_ext OPTIONS(format='AVRO', uris=['$base/out'])")
    val ext = spark.table("avro_ext")
    assert(ext.count() == 100L)
    assert(ext.agg(F.sum("id")).head().getLong(0) == 4950L)
    // LOAD DATA into a session table
    GraftSql.load(spark,
      s"LOAD DATA INTO avro_loaded FROM FILES(format='AVRO', uris=['$base/out'])")
    assert(spark.table("avro_loaded").count() == 100L)
    assert(spark.table("avro_loaded").columns.toSeq == Seq("id", "name", "score"))
    // overwrite export replaces
    GraftSql.load(spark,
      s"EXPORT DATA OPTIONS(uri='$base/out/shard-*.avro', format='AVRO', overwrite=true) AS " +
        "SELECT * FROM avro_src WHERE id < 10")
    assert(spark.read.format("graft-avro").load(s"$base/out").count() == 10L)
  }

  test("streaming sink: writeStream lands epoch-unique avro shards readable as a batch") {
    val srcDir = dir(); val outDir = dir(); val chk = dir()
    graft.sources.Tables.events(spark, sf)
      .select("event_id", "event_type", "value").limit(200)
      .write.mode(SaveMode.Overwrite).parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = stream.writeStream.format("graft-avro")
      .option("checkpointLocation", chk)
      .option("compression", "none")
      .start(outDir)
    q.processAllAvailable(); q.stop()
    val back = spark.read.format("graft-avro").load(outDir)
    assert(back.count() == 200L)
    assert(back.columns.toSeq == Seq("event_id", "event_type", "value"))
  }

  test("streaming source: readStream picks up monotone-named avro files batch by batch") {
    val in = dir(); val chk = dir()
    def land(n: Int, lo: Long): Unit =
      spark.range(lo, lo + n).select(F.col("id"))
        .coalesce(1).write.format("graft-avro")
        .option("compression", "none").mode(SaveMode.Append).save(in)
    land(10, 0)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType, nullable = false))))
      .format("graft-avro").load(in)
    val q = stream.writeStream.format("memory").queryName("avro_src_t")
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    assert(spark.table("avro_src_t").count() == 10L)
    // a second landing (part files carry a later task id → later name
    // ... guarantee monotone names explicitly with a sequenced prefix)
    spark.range(10, 15).select(F.col("id")).coalesce(1)
      .write.format("graft-avro").option("compression", "none")
      .mode(SaveMode.Append).save(s"$in/__tmp_stage")
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(s"$in/__tmp_stage"))
      .filter(_.getPath.getName.endsWith(".avro"))
    staged.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(in, s"zz-batch2-$i.avro"))
    }
    q.processAllAvailable(); q.stop()
    val got = spark.table("avro_src_t").agg(F.count(F.lit(1)), F.sum("id")).head()
    assert(got.getLong(0) == 15L)
    assert(got.getLong(1) == (0L until 15L).sum)
  }

  test("sink→source across epochs: multi-partition shards sort epoch-first, no file skipped") {
    // the hazard: with partition-id-leading names, epoch 2's
    // part-00000 shard would sort BEFORE epoch 1's part-00001 shard
    // and fall behind the source's max-name watermark. Epoch-first
    // names + publish-at-commit make the sink's own output a valid
    // monotone feed for the source.
    val srcDir = dir(); val mid = dir(); val chkSink = dir(); val chkSrc = dir()
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    def land(lo: Long, n: Long): Unit =
      spark.range(lo, lo + n).write.mode(SaveMode.Append).parquet(srcDir)
    land(0, 10)
    val sink = spark.readStream.schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
      .repartition(2) // >1 shard per epoch — the multi-partition case
      .writeStream.format("graft-avro")
      .option("checkpointLocation", chkSink).option("compression", "none")
      .start(mid)
    sink.processAllAvailable()
    val src = spark.readStream.schema(schema).format("graft-avro").load(mid)
      .writeStream.format("memory").queryName("avro_e2e_t")
      .option("checkpointLocation", chkSrc).start()
    src.processAllAvailable()
    assert(spark.table("avro_e2e_t").count() == 10L)
    land(10, 5) // epoch 2 of the sink: 2 more shards, lower partition ids
    sink.processAllAvailable()
    src.processAllAvailable()
    sink.stop(); src.stop()
    val got = spark.table("avro_e2e_t").agg(F.count(F.lit(1)), F.sum("id")).head()
    assert(got.getLong(0) == 15L, s"lost shards: ${got.getLong(0)} of 15 rows arrived")
    assert(got.getLong(1) == (0L until 15L).sum)
    // shard names: epoch id leads, partition id follows
    val fs = new org.apache.hadoop.fs.Path(mid)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(mid))
      .map(_.getPath.getName).filter(_.endsWith(".avro")).sorted
    assert(names.forall(_.matches("e\\d{12}-part-\\d{5}-\\d+\\.avro")), names.mkString(","))
    assert(names.count(_.startsWith("e000000000000-")) == 2)
  }

  test("events round-trip: the FX stream survives avro with timestamps intact") {
    val d = dir()
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
    ev.write.format("graft-avro").mode(SaveMode.Append).save(d)
    val back = spark.read.format("graft-avro").load(d)
    assert(back.count() == ev.count())
    val a = ev.agg(F.max("ts"), F.sum("value")).head()
    val b = back.agg(F.max("ts"), F.sum("value")).head()
    assert(a == b, s"$a != $b")
  }
}
