package graft

import graft.sources.RawJson
import org.apache.spark.SparkException
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class RawJsonSpec extends SparkSuite {

  private def writeFeed(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-rawjson-")
    Files.write(Paths.get(dir.toString, "feed.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  private val good = Seq(
    """{"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.5, "ts_us": 1704067200000000}""",
    """{"event_id": 2, "user_id": 20, "event_type": "view", "value": 2.25, "ts_us": 1704067260000000}""")
  private val malformed = """{"event_id": 3, "user_id": 30 THIS IS NOT JSON"""
  private val wrongType = """{"event_id": "not-a-number", "user_id": 40, "event_type": "x", "value": 1.0, "ts_us": 1704067320000000}"""

  test("PERMISSIVE: clean rows parse typed, bad lines are quarantined, nothing is lost") {
    val dir = writeFeed(good ++ Seq(malformed, wrongType))
    val df = RawJson.load(spark, dir, RawJson.eventSchema)
    assert(RawJson.clean(df).count() == 2)
    val quarantined = RawJson.corruptRecords(df).collect()
      .map(_.getAs[String](RawJson.CorruptCol)).toSet
    assert(quarantined == Set(malformed, wrongType))
    val typed = RawJson.loadEvents(spark, dir).orderBy("event_id").collect()
    assert(typed.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(typed.head.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2024-01-01T00:00:00Z")
  }

  test("FAILFAST: a malformed line aborts the load (reference BigQuery behavior)") {
    val dir = writeFeed(good :+ malformed)
    intercept[SparkException] {
      RawJson.load(spark, dir, RawJson.eventSchema, mode = "FAILFAST").collect()
    }
    // a fully clean feed loads fine under FAILFAST
    val cleanDir = writeFeed(good)
    assert(RawJson.load(spark, cleanDir, RawJson.eventSchema, mode = "FAILFAST").count() == 2)
  }

  test("DROPMALFORMED: bad lines vanish, clean rows survive") {
    val dir = writeFeed(good :+ malformed)
    val df = RawJson.load(spark, dir, RawJson.eventSchema, mode = "DROPMALFORMED")
    assert(df.drop(RawJson.CorruptCol).na.drop("all").count() == 2)
  }

  test("the JSON literal `null` is quarantined, not a clean all-null row") {
    val dir = writeFeed(good :+ "null")
    val df = RawJson.load(spark, dir, RawJson.eventSchema)
    assert(RawJson.clean(df).count() == 2, "null literal must not pass as clean")
    assert(RawJson.corruptRecords(df).collect()
      .map(_.getAs[String](RawJson.CorruptCol)).toSet == Set("null"))
    // FAILFAST treats it as malformed too
    intercept[Exception] {
      RawJson.load(spark, writeFeed(good :+ "null"), RawJson.eventSchema,
        mode = "FAILFAST").collect()
    }
    // and the Kafka decode path drops it (covered again in StreamingSpec)
    assert(RawJson.load(spark, dir, RawJson.eventSchema, mode = "DROPMALFORMED").count() == 2)
  }

  test("a row missing a non-nullable key field is quarantined, not clean") {
    // {"user_id":5} parses fine but has no event_id — from_json does not
    // enforce nullable=false, so without the guard this row would pass
    // as clean and its null key would be re-appended on every
    // redelivery by the idempotency anti-join
    val noKey = """{"user_id": 5, "event_type": "click", "value": 1.0, "ts_us": 1704067200000000}"""
    val nullKey = """{"event_id": null, "user_id": 6, "event_type": "view", "value": 2.0, "ts_us": 1704067260000000}"""
    val dir = writeFeed(good ++ Seq(noKey, nullKey))
    val df = RawJson.load(spark, dir, RawJson.eventSchema)
    assert(RawJson.clean(df).count() == 2, "null-key rows must not pass as clean")
    assert(RawJson.clean(df).filter("event_id IS NULL").count() == 0)
    assert(RawJson.corruptRecords(df).collect()
      .map(_.getAs[String](RawJson.CorruptCol)).toSet == Set(noKey, nullKey))
    // FAILFAST aborts on the schema violation, DROPMALFORMED drops it
    intercept[Exception] {
      RawJson.load(spark, dir, RawJson.eventSchema, mode = "FAILFAST").collect()
    }
    assert(RawJson.load(spark, dir, RawJson.eventSchema, mode = "DROPMALFORMED").count() == 2)
    // nullable fields may still be null in clean rows
    val noUser = """{"event_id": 7, "event_type": "click", "value": 1.0, "ts_us": 1704067200000000}"""
    val df2 = RawJson.load(spark, writeFeed(Seq(noUser)), RawJson.eventSchema)
    assert(RawJson.clean(df2).count() == 1)
  }

  test("declared schema is enforced, not inferred: extra fields ignored, missing fields null") {
    val dir = writeFeed(Seq(
      """{"event_id": 7, "user_id": 70, "event_type": "click", "value": 3.5, "ts_us": 1704067200000000, "surprise_field": "zzz"}""",
      """{"event_id": 8}"""))
    val rows = RawJson.clean(RawJson.load(spark, dir, RawJson.eventSchema))
      .orderBy("event_id").collect()
    assert(rows.length == 2)
    assert(!rows.head.schema.fieldNames.contains("surprise_field"))
    assert(rows(1).getLong(0) == 8L && rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }

  test("raw-JSON round trip of the events feed is lossless") {
    val q = SparkEntry.queries("fx_ingest_raw_json")(spark, sf)
    val direct = graft.sources.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_id"))
    assert(q.count() == direct.count())
  }
}
