package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Raw-JSON document ingestion: newline-delimited JSON files → typed
  * rows under an EXPLICIT schema with a corrupt-record policy — the
  * Spark form of the reference's typed load
  * (`LoadJobConfig(schema=[SchemaField(...)], ...)`,
  * idempotent_fx_pipeline.py:90-100). Schema inference is deliberately
  * not offered: at 100 TB an inference pass is a second full read, and
  * a drifting upstream field silently retypes the table; a declared
  * schema makes drift a visible load failure instead.
  *
  * Modes (spark.read.json semantics):
  *  - PERMISSIVE (default): malformed lines land in
  *    `_corrupt_record`, well-formed fields of partly-bad rows null
  *    out — ingest continues, quarantine via `corruptRecords`.
  *  - FAILFAST: any malformed line aborts the load — the reference's
  *    BigQuery behavior (a bad batch fails the DAG task).
  *  - DROPMALFORMED: bad lines vanish (use with a count audit).
  */
object RawJson {

  val CorruptCol = "_corrupt_record"

  /** The reference's FX-rate schema (date, from_cur, to_cur, rate,
    * timestamp — idempotent_fx_pipeline.py:93-99) transposed to the
    * events feed this repo ingests. Timestamps travel as epoch-micros
    * longs: JSON has no timestamp type, and a numeric wire format
    * dodges the engine-specific string-parsing corners.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts_us", LongType)))

  /** Load newline-delimited JSON at `path` as `schema` + a
    * `_corrupt_record` column (null for clean rows in PERMISSIVE mode).
    *
    * Implemented as text-scan + `from_json` rather than
    * `spark.read.json`: the raw-JSON file source forbids any plan
    * whose referenced columns reduce to the corrupt column alone
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN — which a plain
    * `clean(df).count()` triggers after pruning), while the same
    * Jackson parser behind `from_json` has no such restriction. Text
    * files split and parallelize identically, and the parse stays in
    * one codegen'd projection.
    */
  def load(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame = {
    val full = schema.add(CorruptCol, StringType)
    val parseMode = if (mode == "DROPMALFORMED") "PERMISSIVE" else mode
    val base = spark.read.text(path)
      .filter(F.length(F.trim(F.col("value"))) > 0) // json source skips blank lines; match it
      .select(F.col("value"), F.from_json(F.col("value"), full,
        Map("mode" -> parseMode, "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    // Two shapes parse "successfully" but violate the declared schema:
    // the valid-JSON literal `null` (a NULL struct — neither typed nor
    // quarantined) and rows MISSING a nullable=false field (from_json
    // does not enforce the schema's nullability, so {"user_id":5}
    // yields a null event_id). Both must hit the corrupt channel (or
    // fail the load under FAILFAST): a null key row would otherwise
    // never match downstream idempotency anti-joins (Upsert.freshRows'
    // using-column equality is not null-safe) and be re-appended on
    // every redelivery.
    val keyViolated = schema.fields.filter(!_.nullable)
      .map(f => F.col("r").getField(f.name).isNull)
      .reduceOption(_ || _).getOrElse(F.lit(false))
    val invalid = F.col("r").isNull || keyViolated
    val guarded =
      if (parseMode == "FAILFAST")
        base.filter(F.when(!invalid, F.lit(true))
          .otherwise(F.raise_error(F.concat(
            F.lit("[MALFORMED_RECORD_IN_PARSING] null literal or null non-nullable field: "),
            F.col("value"))).isNotNull))
      else base
    val nullRow = F.struct(
      schema.fields.map(f => F.lit(null).cast(f.dataType).as(f.name)) :+
        F.col("value").cast(StringType).as(CorruptCol): _*)
    val parsed = guarded
      .select(F.when(!invalid, F.col("r")).otherwise(nullRow).as("r"))
      .select("r.*")
    // from_json has no DROPMALFORMED; emulate by dropping quarantined rows
    if (mode == "DROPMALFORMED") parsed.filter(F.col(CorruptCol).isNull) else parsed
  }

  /** Clean rows only, corrupt column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(F.col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine side: full rows for every malformed line (raw
    * text in `_corrupt_record`). Kept as whole rows — Spark disallows
    * a scan whose only referenced column is the internal corrupt
    * column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the partly-parsed
    * fields are useful forensics anyway.
    */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(F.col(CorruptCol).isNotNull)

  /** Events loaded from raw JSON into the pipeline's typed shape
    * (epoch-micros → timestamp), ready for `FxPipeline.ingest`.
    */
  def loadEvents(spark: SparkSession, path: String): DataFrame =
    clean(load(spark, path, eventSchema))
      .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
      .drop("ts_us")
}
