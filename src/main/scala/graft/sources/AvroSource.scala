package graft.sources

import java.util.{ArrayList => JArrayList, HashMap => JHashMap}

import scala.collection.JavaConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Apache Avro container files as a minimal DataSource V2 — built
  * directly on the avro core jars (`org.apache.avro`, present on every
  * Spark classpath as a Spark dependency), because the `spark-avro`
  * CONNECTOR module is not on this classpath. BigQuery load/export
  * jobs speak Avro routinely (the A28/A32/A34 statements route here
  * for `format='AVRO'`), so the engine carries its own thin bridge:
  *
  *  - **Read**: each file splits into byte ranges of
  *    `spark.sql.files.maxPartitionBytes` (the task seeks to the first
  *    Avro SYNC MARKER past its range start and reads until past the
  *    range end — the avro-mapred InputFormat discipline), so one
  *    giant export file still fans out across a cluster; column
  *    pruning pushes into the Avro RESOLVER (a projected reader
  *    schema makes the decoder skip unread fields).
  *  - **Write**: one container file per task, attempt-uniquely named;
  *    Spark's commit coordinator picks one winner per task, `abort`
  *    deletes the loser's file. Overwrite (TRUNCATE capability)
  *    deletes the pre-existing `*.avro` set at commit, after the new
  *    files are all in place.
  *  - **Types**: the BigQuery-export subset, both directions —
  *    boolean/int/long/float/double/string/bytes/fixed/enum,
  *    `date`/`timestamp-micros`/`timestamp-millis`/local-timestamp,
  *    `decimal` (bytes or fixed), arrays, string-keyed maps, nested
  *    records, and `[null, T]` unions for nullability. Multi-branch
  *    unions are loud — stated trade.
  *
  * Registered as `graft-avro` via DataSourceRegister; GraftSql's
  * EXTERNAL TABLE / EXPORT DATA / LOAD DATA dispatch `AVRO` here.
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroSource.listFiles(options)
    require(files.nonEmpty, s"no avro files found under ${AvroSource.paths(options).mkString(", ")}")
    val conf = AvroSource.driverConf()
    val in = new FsInput(files.head.getPath, conf)
    try {
      val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try AvroConv.toSparkType(r.getSchema).asInstanceOf[StructType]
      finally r.close()
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, properties)
}

private[sources] object AvroSource {
  /** Session Hadoop configuration for DRIVER-side filesystem access
    * (listing, schema inference, commit/abort): without it,
    * session-configured credentials and custom schemes (s3a keys
    * etc.) would be silently dropped. Executor-side access gets the
    * same conf via a [[SerializableConfiguration]] captured at plan /
    * write-build time.
    */
  def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def paths(options: java.util.Map[String, String]): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    // DataFrameReader.load(paths: _*) passes a JSON string array
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      js.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    single ++ multi
  }

  /** Expand each path: glob patterns via globStatus, directories to
    * their `*.avro` children, plain files verbatim. Hidden files
    * (`.`/`_` prefixes — in-progress streaming shards, `_SUCCESS`)
    * are skipped, the Hadoop convention.
    */
  def listFiles(options: java.util.Map[String, String]): Seq[FileStatus] = {
    val conf = driverConf()
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched: Seq[FileStatus] =
        Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && visible(f.getPath.getName))
        // glob/plain-file matches keep an explicitly-named extension
        // choice, but NEVER surface hidden files — a `dir/*` glob must
        // not read `.inprogress-` streaming shards mid-epoch or
        // `_SUCCESS`, or the publish-at-commit watermark breaks
        else Seq(st).filter(f => !hidden(f.getPath.getName))
      }
    }.sortBy(_.getPath.toString)
  }

  def hidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  def visible(name: String): Boolean =
    name.endsWith(".avro") && !hidden(name)
}

private[sources] class AvroTable(schema: StructType,
                                 properties: java.util.Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-avro:${AvroSource.paths(properties).mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = AvroSource.paths(info.options).headOption.getOrElse(
      throw new IllegalArgumentException("avro write needs a path"))
    // fail on the DRIVER, not inside a task: avro names are stricter
    // than SQL's (unaliased `SELECT 1` yields a column named "1")
    AvroConv.toAvroSchema(info.schema())
    new AvroWriteBuilder(info.schema(), path,
      Option(info.options.get("compression")).getOrElse("snappy"))
  }
}

// ───────────────────────── read side ─────────────────────────

private[sources] class AvroScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(required, options)
}

private[sources] case class AvroFileSplit(file: String, start: Long, length: Long)
    extends InputPartition

private[sources] class AvroScan(required: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  // session hadoop conf, captured on the driver at plan time and
  // shipped to executor-side readers
  private val confSer = new SerializableConfiguration(AvroSource.driverConf())
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = "graft-avro"
  override def toMicroBatchStream(checkpointLocation: String)
  : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(required, options)

  override def planInputPartitions(): Array[InputPartition] = {
    val files = AvroSource.listFiles(options)
    val maxBytes = Option(options.get("maxPartitionBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    files.flatMap { st =>
      val len = st.getLen
      if (len <= maxBytes) Seq(AvroFileSplit(st.getPath.toString, 0L, len))
      else (0L until len by maxBytes).map(off =>
        AvroFileSplit(st.getPath.toString, off, math.min(maxBytes, len - off)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, confSer)
}

/** Streaming READS over a growing avro directory: the offset is a
  * FILE-NAME WATERMARK — every file whose name sorts at-or-below the
  * offset has been processed, a batch is the name interval
  * (start, end]. Deterministic replay after restart needs no file log
  * in the checkpoint because the CONTRACT is monotone arrival: new
  * files must sort strictly after already-seen ones. The graft-avro
  * STREAMING WRITER satisfies it by construction: shard names lead
  * with the zero-padded epoch (`e<epoch>-part-...`), shards are
  * written hidden (`.inprogress-` prefix, invisible to listFiles) and
  * published by rename at epoch commit in ASCENDING final-name order,
  * so at any instant the visible prefix of an epoch never sorts after
  * a still-hidden shard of the same epoch — the max-name watermark
  * can never step over an unpublished file. Any date/sequence-named
  * landing pattern also satisfies the contract; an out-of-order
  * drop-in would be silently skipped — stated. Each batch splits
  * files by sync markers exactly like the batch scan.
  */
private[sources] class AvroMicroBatchStream(required: StructType,
                                            options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  private val confSer = new SerializableConfiguration(AvroSource.driverConf())

  private case class NameOffset(max: String) extends Offset {
    override def json(): String = max
  }
  private def names(): Seq[FileStatus] = AvroSource.listFiles(options)

  override def initialOffset(): Offset = NameOffset("")
  override def latestOffset(): Offset = {
    val fs = names()
    NameOffset(if (fs.isEmpty) "" else fs.map(_.getPath.getName).max)
  }
  override def deserializeOffset(json: String): Offset = NameOffset(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[NameOffset].max
    val hi = end.asInstanceOf[NameOffset].max
    val maxBytes = Option(options.get("maxPartitionBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    names()
      .filter(f => f.getPath.getName > lo && f.getPath.getName <= hi)
      .flatMap { st =>
        val len = st.getLen
        if (len <= maxBytes) Seq(AvroFileSplit(st.getPath.toString, 0L, len))
        else (0L until len by maxBytes).map(off =>
          AvroFileSplit(st.getPath.toString, off, math.min(maxBytes, len - off)))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, confSer)
}

private[sources] class AvroReaderFactory(required: StructType,
                                         confSer: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(partition.asInstanceOf[AvroFileSplit], required, confSer.value)
}

private[sources] class AvroPartitionReader(split: AvroFileSplit, required: StructType,
                                           conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val in = new FsInput(new Path(split.file), conf)
  private val reader: DataFileReader[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    // projected READER schema: the resolver skips unrequested fields
    val writerSchema = r.getSchema
    val projected = AvroConv.projectRecord(writerSchema, required.fieldNames)
    r.close()
    val in2Reader = new GenericDatumReader[GenericRecord](writerSchema, projected)
    new DataFileReader[GenericRecord](new FsInput(new Path(split.file), conf), in2Reader)
  }
  // range discipline: first sync past `start`, read until past the end
  reader.sync(split.start)
  private val converters = required.fields.map { f =>
    val avroField = reader.getSchema.getField(f.name)
    require(avroField != null, s"column ${f.name} absent from avro file ${split.file}")
    (f.name, AvroConv.readConverter(f.dataType, AvroConv.nonNull(avroField.schema())))
  }
  private var current: GenericRecord = _

  override def next(): Boolean = {
    if (reader.hasNext && !reader.pastSync(split.start + split.length)) {
      current = reader.next(current); true
    } else false
  }

  override def get(): InternalRow = {
    val out = new GenericInternalRow(converters.length)
    var i = 0
    while (i < converters.length) {
      val (name, conv) = converters(i)
      val v = current.get(name)
      out.update(i, if (v == null) null else conv(v))
      i += 1
    }
    out
  }

  override def close(): Unit = { reader.close() }
}

// ───────────────────────── write side ─────────────────────────

private[sources] class AvroWriteBuilder(schema: StructType, path: String,
                                        compression: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    // session hadoop conf, captured on the driver at write-build time
    private val confSer = new SerializableConfiguration(AvroSource.driverConf())
    override def toBatch: BatchWrite =
      new AvroBatchWrite(schema, path, compression, truncateFirst, confSer)
    // streaming: append-only epoch files (G-family sinks can stream
    // straight to avro shards); epoch id rides the filename so task
    // retries across epochs never collide
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new AvroStreamingWrite(schema, path, compression, confSer)
  }
}

private[sources] case class AvroCommit(file: String) extends WriterCommitMessage

private[sources] class AvroStreamingWrite(schema: StructType, path: String,
                                          compression: String,
                                          confSer: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
  : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new AvroStreamingWriterFactory(schema, path, compression, confSer)
  // tasks write HIDDEN `.inprogress-<final>` shards (invisible to the
  // source's directory listing); the epoch commit publishes them by
  // rename in ASCENDING final-name order, so a concurrent lister can
  // only ever see a name-order PREFIX of the epoch — the downstream
  // max-name watermark never steps over a still-hidden shard.
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(confSer.value)
    messages.collect { case AvroCommit(f) => new Path(f) }
      .sortBy(p => AvroDataWriter.publishedName(p.getName))
      .foreach { p =>
        val target = new Path(p.getParent, AvroDataWriter.publishedName(p.getName))
        require(fs.rename(p, target), s"failed to publish avro shard $p -> $target")
      }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(confSer.value)
    messages.collect { case AvroCommit(f) => fs.delete(new Path(f), false) }
  }
}

private[sources] class AvroStreamingWriterFactory(schema: StructType, path: String,
                                                  compression: String,
                                                  confSer: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
  : DataWriter[InternalRow] =
    // epoch FIRST and zero-padded, AHEAD of the partition id: epoch
    // N+1's shards all sort strictly after every epoch-N shard no
    // matter the partition/task ids — the streaming SOURCE's
    // file-name watermark contract feeds off exactly this ordering.
    // (Task ids are app-global counters, so arithmetic like
    // epoch*k+task would collide in a long-running app.) The writer
    // prepends `.inprogress-`, hiding the shard until epoch commit.
    new AvroDataWriter(schema, path, compression,
      AvroDataWriter.inProgress(f"e$epochId%012d-part-$partitionId%05d-$taskId.avro"),
      confSer.value)
}

private[sources] class AvroBatchWrite(schema: StructType, path: String,
                                      compression: String, truncateFirst: Boolean,
                                      confSer: SerializableConfiguration)
    extends BatchWrite {
  // capture the pre-existing file set NOW (job start): overwrite
  // deletes exactly these at commit, after the new files landed —
  // new files are attempt-unique so the sets never collide
  private val preExisting: Seq[String] =
    if (!truncateFirst) Seq.empty
    else {
      val p = new Path(path)
      val fs = p.getFileSystem(confSer.value)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString)
    }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(schema, path, compression, confSer)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(confSer.value)
    preExisting.foreach(f => fs.delete(new Path(f), false))
    val ok = fs.create(new Path(path, "_SUCCESS"), true)
    ok.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(confSer.value)
    messages.collect { case AvroCommit(f) => fs.delete(new Path(f), false) }
  }
}

private[sources] class AvroWriterFactory(schema: StructType, path: String,
                                         compression: String,
                                         confSer: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(schema, path, compression,
      f"part-$partitionId%05d-$taskId.avro", confSer.value)
}

private[sources] object AvroDataWriter {
  private val InProgressPrefix = ".inprogress-"
  def inProgress(finalName: String): String = InProgressPrefix + finalName
  def publishedName(name: String): String = name.stripPrefix(InProgressPrefix)
}

private[sources] class AvroDataWriter(schema: StructType, path: String,
                                      compression: String, fileName: String,
                                      conf: Configuration)
    extends DataWriter[InternalRow] {
  private val avroSchema = AvroConv.toAvroSchema(schema)
  private val file = new Path(path, fileName)
  private val fs = file.getFileSystem(conf)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    compression.toLowerCase match {
      case "snappy" => w.setCodec(CodecFactory.snappyCodec())
      case "deflate" | "gzip" => w.setCodec(CodecFactory.deflateCodec(6))
      case "none" | "uncompressed" => ()
      case other => throw new IllegalArgumentException(s"unsupported avro codec: $other")
    }
    fs.mkdirs(file.getParent)
    w.create(avroSchema, fs.create(file, false))
  }
  private val converters = schema.fields.zipWithIndex.map { case (f, i) =>
    AvroConv.writeConverter(f.dataType,
      AvroConv.nonNull(avroSchema.getFields.get(i).schema()))
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < converters.length) {
      rec.put(i, if (row.isNullAt(i)) null else converters(i)(row.get(i, schema.fields(i).dataType)))
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = { writer.close(); AvroCommit(file.toString) }
  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    fs.delete(file, false)
  }
  override def close(): Unit = ()
}

// ───────────────────────── type bridge ─────────────────────────

private[sources] object AvroConv {

  /** Avro schema → Spark type. Unions must be `[null, T]` (or a bare
    * single branch) — multi-branch unions are loud, stated trade.
    */
  def toSparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
      case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
      case lt if lt != null && lt.getName == "local-timestamp-micros" => TimestampNTZType
      case _ => LongType
    }
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case ASchema.Type.ARRAY =>
      val (el, nullable) = unwrap(s.getElementType)
      ArrayType(toSparkType(el), containsNull = nullable)
    case ASchema.Type.MAP =>
      val (v, nullable) = unwrap(s.getValueType)
      MapType(StringType, toSparkType(v), valueContainsNull = nullable)
    case ASchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (t, nullable) = unwrap(f.schema())
        StructField(f.name(), toSparkType(t), nullable)
      })
    case ASchema.Type.NULL => NullType
    case ASchema.Type.UNION =>
      val (t, _) = unwrap(s)
      toSparkType(t)
  }

  /** Strip a `[null, T]` union to (T, nullable=true). */
  private def unwrap(s: ASchema): (ASchema, Boolean) =
    if (s.getType != ASchema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] avro unions are supported, got $s")
      (branches.head, branches.size < s.getTypes.size())
    }

  /** Projected reader schema: the writer's record with only `names`
    * fields — the avro resolver then SKIPS everything else at decode.
    */
  def projectRecord(writer: ASchema, names: Array[String]): ASchema = {
    val keep = names.toSet
    val fields = writer.getFields.asScala.filter(f => keep(f.name())).map { f =>
      new ASchema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    val rec = ASchema.createRecord(writer.getName, writer.getDoc, writer.getNamespace, false)
    rec.setFields(fields.asJava)
    rec
  }

  /** Avro runtime value → Catalyst value. `avro` is the value's
    * concrete (non-union) writer schema — it disambiguates
    * timestamp-millis (×1000 to micros) from timestamp-micros.
    */
  def readConverter(t: DataType, avro: ASchema): Any => Any = t match {
    case StringType => v => UTF8String.fromString(v.toString)
    case IntegerType | DateType => v => v.asInstanceOf[Number].intValue()
    case LongType => v => v.asInstanceOf[Number].longValue()
    case TimestampType | TimestampNTZType =>
      val millis = avro.getLogicalType != null &&
        avro.getLogicalType.getName == "timestamp-millis"
      if (millis) v => v.asInstanceOf[Number].longValue() * 1000L
      else v => v.asInstanceOf[Number].longValue()
    case BooleanType => v => v
    case FloatType => v => v.asInstanceOf[Number].floatValue()
    case DoubleType => v => v.asInstanceOf[Number].doubleValue()
    case BinaryType => {
      case bb: java.nio.ByteBuffer => bytesOf(bb)
      case gf: GenericFixed => gf.bytes().clone()
      case other => other
    }
    case d: DecimalType => v => {
      val unscaled = v match {
        case bb: java.nio.ByteBuffer => new java.math.BigInteger(bytesOf(bb))
        case gf: GenericFixed => new java.math.BigInteger(gf.bytes())
        case other => throw new IllegalArgumentException(s"bad decimal payload: $other")
      }
      Decimal(new java.math.BigDecimal(unscaled, d.scale), d.precision, d.scale)
    }
    case ArrayType(el, _) =>
      val conv = readConverter(el, nonNull(avro.getElementType))
      v => {
        val list = v.asInstanceOf[java.util.Collection[Any]].asScala.toArray
        new GenericArrayData(list.map(x => if (x == null) null else conv(x)))
      }
    case MapType(StringType, vt, _) =>
      val conv = readConverter(vt, nonNull(avro.getValueType))
      v => {
        val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
        new ArrayBasedMapData(
          new GenericArrayData(m.map(kv => UTF8String.fromString(kv._1.toString)).toArray[Any]),
          new GenericArrayData(m.map(kv => if (kv._2 == null) null else conv(kv._2)).toArray[Any]))
      }
    case st: StructType =>
      val convs = st.fields.map { f =>
        val af = avro.getField(f.name)
        require(af != null, s"nested field ${f.name} absent from avro record $avro")
        (f.name, readConverter(f.dataType, nonNull(af.schema())))
      }
      v => {
        val rec = v.asInstanceOf[GenericRecord]
        val out = new GenericInternalRow(convs.length)
        var i = 0
        while (i < convs.length) {
          val x = rec.get(convs(i)._1)
          out.update(i, if (x == null) null else convs(i)._2(x))
          i += 1
        }
        out
      }
    case other => throw new IllegalArgumentException(s"unsupported avro read type: $other")
  }

  private def bytesOf(bb: java.nio.ByteBuffer): Array[Byte] = {
    val out = new Array[Byte](bb.remaining())
    bb.duplicate().get(out)
    out
  }

  /** Spark schema → Avro schema (fields nullable via `[null, T]`). */
  def toAvroSchema(schema: StructType): ASchema = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    toAvroRecord(schema, "topLevelRecord", counter)
  }

  private def toAvroRecord(st: StructType, name: String,
                           c: java.util.concurrent.atomic.AtomicInteger): ASchema = {
    val rec = ASchema.createRecord(name, null, "graft.avro", false)
    rec.setFields(st.fields.map { f =>
      val base = toAvroType(f.dataType, f.name, c)
      val fieldSchema =
        if (f.nullable) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
        else base
      new ASchema.Field(f.name, fieldSchema,
        null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }.toSeq.asJava)
    rec
  }

  private def toAvroType(t: DataType, hint: String,
                         c: java.util.concurrent.atomic.AtomicInteger): ASchema = t match {
    case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => ASchema.create(ASchema.Type.INT)
    case LongType => ASchema.create(ASchema.Type.LONG)
    case FloatType => ASchema.create(ASchema.Type.FLOAT)
    case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
    case StringType => ASchema.create(ASchema.Type.STRING)
    case BinaryType => ASchema.create(ASchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(ASchema.create(ASchema.Type.BYTES))
    case ArrayType(el, containsNull) =>
      val e = toAvroType(el, hint, c)
      ASchema.createArray(
        if (containsNull) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), e) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, hint, c)
      ASchema.createMap(
        if (valueContainsNull) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), v) else v)
    case st: StructType => toAvroRecord(st, s"${hint}_rec${c.incrementAndGet()}", c)
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type for avro write: $other")
  }

  /** Strip the null branch off a `[null, T]` union (identity for
    * non-unions) — the write converters need the concrete branch
    * schema so nested records carry the UNION-RESOLVABLE name.
    */
  def nonNull(s: ASchema): ASchema =
    if (s.getType != ASchema.Type.UNION) s
    else s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(s)

  /** Catalyst value → Avro runtime value, per Spark type. `avro` is
    * the value's concrete (non-union) schema from the SAME tree the
    * file writer uses — nested GenericData.Records must carry that
    * exact schema so union resolution finds them by name.
    */
  def writeConverter(t: DataType, avro: ASchema): Any => Any = t match {
    case StringType => v => v.asInstanceOf[UTF8String].toString
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         DateType | TimestampType | TimestampNTZType => v => v
    case ByteType => v => v.asInstanceOf[Byte].toInt
    case ShortType => v => v.asInstanceOf[Short].toInt
    case BinaryType => v => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case _: DecimalType => v =>
      java.nio.ByteBuffer.wrap(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
    case ArrayType(el, _) =>
      val conv = writeConverter(el, nonNull(avro.getElementType))
      v => {
        val arr = v.asInstanceOf[ArrayData]
        val out = new JArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(if (arr.isNullAt(i)) null else conv(arr.get(i, el)))
          i += 1
        }
        out
      }
    case MapType(StringType, vt, _) =>
      val conv = writeConverter(vt, nonNull(avro.getValueType))
      v => {
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        val out = new JHashMap[String, Any](m.numElements() * 2)
        var i = 0
        while (i < m.numElements()) {
          out.put(ks.getUTF8String(i).toString,
            if (vs.isNullAt(i)) null else conv(vs.get(i, vt)))
          i += 1
        }
        out
      }
    case st: StructType =>
      val convs = st.fields.zipWithIndex.map { case (f, i) =>
        writeConverter(f.dataType, nonNull(avro.getFields.get(i).schema()))
      }
      v => {
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < convs.length) {
          rec.put(i, if (row.isNullAt(i)) null else convs(i)(row.get(i, st.fields(i).dataType)))
          i += 1
        }
        rec
      }
    case other => throw new IllegalArgumentException(s"unsupported avro write type: $other")
  }
}
