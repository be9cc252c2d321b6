package graft

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.functions.{bloom, BloomBuffer}
import graft.operators.BloomJoin
import graft.sources.Tables

class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def sig(df: DataFrame): Map[String, Long] =
    df.select(F.md5(F.concat_ws(1.toChar.toString, df.columns.map(c => F.col(c).cast("string")): _*)).as("h"))
      .groupBy("h").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("BloomBuffer has no false negatives and honours the fpp bound") {
    val buf = BloomBuffer.sized(10000, 0.01)
    val rng = new scala.util.Random(7)
    val inserted = Array.fill(10000)(rng.nextLong())
    inserted.foreach(buf.insert)
    assert(inserted.forall(buf.mightContain), "false negative on an inserted hash")
    // disjoint probes: measured fpp within 3x of nominal
    val insertedSet = inserted.toSet
    val probes = Array.fill(100000)(rng.nextLong()).filterNot(insertedSet)
    val fp = probes.count(buf.mightContain).toDouble / probes.length
    assert(fp < 0.03, s"measured fpp $fp exceeds 3x the nominal 0.01")
  }

  test("serialization round-trips bit-exactly") {
    val buf = BloomBuffer.sized(100, 0.05)
    (1L to 100L).map(i => i * 0x9e3779b97f4a7c15L).foreach(buf.insert)
    val back = BloomBuffer.deserialize(buf.serialized)
    assert(back.numHashes == buf.numHashes)
    assert(back.words.toSeq == buf.words.toSeq)
  }

  test("distributed bloom_agg equals a single-threaded build") {
    val hashes = (1 to 5000).map(i => Hashing.scramble(i))
    val df = hashes.toDF("h").repartition(8)
    val distributed = BloomBuffer.deserialize(
      df.agg(bloom.bloom_agg(F.col("h"), 5000, 0.01)).head().getAs[Array[Byte]](0))
    val local = BloomBuffer.sized(5000, 0.01)
    hashes.foreach(local.insert)
    assert(distributed.words.toSeq == local.words.toSeq,
      "OR-merged partials must equal the sequential build")
  }

  test("antiJoin equals plain left_anti on data with nulls and duplicates") {
    val left = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (null, "n1"), (null, "n2"), (7L, "x"))
      .toDF("k", "v").repartition(4)
    val list = Seq[(java.lang.Long, String)]((2L, "drop"), (3L, "drop"), (null, "ghost"))
      .toDF("k", "w").repartition(3)
    val plain = left.join(list.select("k"), Seq("k"), "left_anti")
    val reduced = BloomJoin.antiJoin(left, list, Seq("k"), expectedItems = 10)
    assert(reduced.columns.toSeq == left.columns.toSeq)
    assert(sig(reduced) == sig(plain))
  }

  test("semiJoin equals plain left_semi (false positives must not survive)") {
    val rng = new scala.util.Random(11)
    val left = (1 to 4000).map(i => (rng.nextInt(1000).toLong, i)).toDF("k", "v").repartition(8)
    // tiny filter relative to the probe key space -> real false positives exercised
    val list = (0 until 50).map(i => (i.toLong * 19L % 1000L, s"w$i")).toDF("k", "w")
    val plain = left.join(list.select("k"), Seq("k"), "left_semi")
    val reduced = BloomJoin.semiJoin(left, list, Seq("k"), expectedItems = 50, fpp = 0.2)
    assert(sig(reduced) == sig(plain))
  }

  test("antiJoin on the fixture tables matches the plain spelling") {
    val li = Tables.lineitem(spark, sf)
    val drop = Tables.orders(spark, sf).filter(F.col("o_orderstatus") === "F")
      .select(F.col("o_orderkey").as("l_orderkey"))
    val plain = li.join(drop, Seq("l_orderkey"), "left_anti")
    val reduced = BloomJoin.antiJoin(li, drop, Seq("l_orderkey"), expectedItems = 10000)
    assert(sig(reduced) == sig(plain))
  }

  test("mismatched key types still match: hashes align to the SQL common type") {
    // xxhash64(INT 5) != xxhash64(BIGINT 5); without the common-type
    // cast every true match would route down the negative branch
    val left = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val list = (1 to 50).map(i => (i * 2, "w")).toDF("k", "w") // INT keys
    assert(list.schema("k").dataType != left.schema("k").dataType)
    val plainAnti = left.join(list.select("k"), Seq("k"), "left_anti")
    val plainSemi = left.join(list.select("k"), Seq("k"), "left_semi")
    assert(sig(BloomJoin.antiJoin(left, list, Seq("k"), 50)) == sig(plainAnti))
    assert(sig(BloomJoin.semiJoin(left, list, Seq("k"), 50)) == sig(plainSemi))
  }

  test("persisted filter round-trips and reproduces the build-per-query joins") {
    val left = Tables.lineitem(spark, sf)
    val list = Tables.orders(spark, sf).filter(F.col("o_orderstatus") === "F")
      .select(F.col("o_orderkey").as("l_orderkey"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-").toString
    val saved = BloomJoin.buildAndSaveFilter(spark, list, Seq("l_orderkey"), 10000, dir)
    val loaded = BloomJoin.loadFilter(spark, dir)
    // round-trip: bytes, key names, and types all survive
    assert(java.util.Arrays.equals(loaded.filter, saved.filter))
    assert(loaded.keys == saved.keys && loaded.keyTypes == saved.keyTypes)
    // the persisted joins equal both the plain spelling and the
    // build-per-query path — multi-query reuse without a rebuild
    assert(sig(BloomJoin.antiJoinPersisted(left, list, loaded)) ==
      sig(left.join(list, Seq("l_orderkey"), "left_anti")))
    assert(sig(BloomJoin.semiJoinPersisted(left, list, loaded)) ==
      sig(left.join(list, Seq("l_orderkey"), "left_semi")))
  }

  test("the definite-negative path is map-only (no Exchange above its scan)") {
    val left = Tables.lineitem(spark, sf)
    val list = Tables.orders(spark, sf).filter(F.col("o_orderstatus") === "F")
      .select(F.col("o_orderkey").as("l_orderkey"))
    val filter = BloomJoin.buildFilter(list, Seq("l_orderkey"), 10000)
    // the pass-through branch in isolation: filter over the source, nothing else
    val misses = left.filter(F.col("l_orderkey").isNull ||
      !bloom.bloom_might_contain(F.xxhash64(F.col("l_orderkey")), filter))
    // string match: AdaptiveSparkPlanExec hides children from collect
    val plan = misses.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bloom pre-filter must not shuffle:\n${plan.take(1000)}")
    // and the probe stays inside whole-stage codegen (spans render as "*(n)")
    assert(plan.contains("*(1) Filter"), s"probe fell out of codegen:\n${plan.take(1000)}")
  }

  test("anti/semi join keep the left frame's column order when the key is not leading") {
    import spark.implicits._
    // Spark 4's using-join moves key columns first even for anti/semi
    // joins; the hits branch must restore the left order or the
    // positional unionAll with the misses branch silently type-coerces
    // (regression: found via Url.dropBlockedDomains, string domain
    // key in third position unioned into a bigint doc_id column)
    val left = Seq((1L, "u1", "a"), (2L, "u2", "b"), (3L, "u3", "a"), (4L, "u4", null))
      .toDF("id", "payload", "k")
    val list = Seq("a").toDF("k")
    val anti = BloomJoin.antiJoin(left, list, Seq("k"), 4)
    assert(anti.columns.toSeq == Seq("id", "payload", "k"))
    assert(anti.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    val semi = BloomJoin.semiJoin(left, list, Seq("k"), 4)
    assert(semi.columns.toSeq == Seq("id", "payload", "k"))
    assert(semi.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  private object Hashing {
    def scramble(i: Int): Long = {
      var z = i.toLong * 0x9e3779b97f4a7c15L
      z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
      z ^= z >>> 27; z *= 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }
}
