package graft

import graft.operators.{AsOf, Dedup, Upsert}
import org.apache.spark.sql.{AnalysisException, functions => F}

class RobustnessSpec extends SparkSuite {
  import spark.implicits._

  test("merge fails loudly when source is missing target columns") {
    val target = Seq((1L, "a", 1.0)).toDF("k", "name", "v")
    val bad = Seq((1L, 2.0)).toDF("k", "v") // no "name"
    intercept[AnalysisException] {
      Upsert.merge(target, bad, Seq("k")).collect()
    }
  }

  test("operators degrade cleanly on empty inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() == 0)

    val target = Seq((1L, 1.0)).toDF("k", "v")
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(Upsert.merge(target, empty, Seq("k")).count() == 1)
    assert(Upsert.idempotentAppend(target, empty, Seq("k")).count() == 1)
    assert(Upsert.merge(empty, target, Seq("k")).count() == 1)
  }

  test("round-4 operators degrade cleanly on empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(graft.operators.Mixing
      .temperatureMixBySqrt(emptyDocs, "doc_id", "source", 1, 2).count() == 0)
    assert(graft.operators.Packing
      .packGreedy(emptyDocs.withColumn("n", F.lit(1L)), "doc_id", "n", 100L, 4).count() == 0)
    assert(graft.operators.Boilerplate
      .dropBoilerplateLines(emptyDocs, "doc_id", "text", 2).count() == 0)
    assert(graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b").count() == 0)

    // single-source mix degenerates to the plain hash split fraction
    val one = (1 to 400).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    val kept = graft.operators.Mixing
      .temperatureMixBySqrt(one, "doc_id", "source", 1, 2).count()
    val split = graft.operators.Sampling.splitByHash(one, "doc_id", 1, 2)
      .filter(F.col("split") === "train").count()
    assert(kept == split, s"single-source mix $kept must equal the 1/2 hash split $split")

    // mix fraction bounds reject loudly
    intercept[IllegalArgumentException] {
      graft.operators.Mixing.temperatureMixBySqrt(one, "doc_id", "source", 3, 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Packing.packGreedy(one.withColumn("n", F.lit(1L)), "doc_id", "n", 0L, 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Boilerplate.dropBoilerplateLines(one.withColumn("text", F.lit("x")),
        "doc_id", "text", 1)
    }
  }

  test("round-5 operators degrade cleanly on empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // chunking: empty corpus -> no chunks; bad overlap rejects loudly
    assert(graft.operators.Chunking
      .chunkByTokens(emptyDocs, "doc_id", "text", 8, 2).count() == 0)
    intercept[IllegalArgumentException] {
      graft.operators.Chunking.chunkByTokens(emptyDocs, "doc_id", "text", 8, 8)
    }
    // bloom join: an EMPTY droplist must pass everything (anti) /
    // nothing (semi); bad fpp rejects loudly
    val left = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val noList = Seq.empty[(Long, String)].toDF("k", "w")
    assert(graft.operators.BloomJoin.antiJoin(left, noList, Seq("k"), 10).count() == 50)
    assert(graft.operators.BloomJoin.semiJoin(left, noList, Seq("k"), 10).count() == 0)
    intercept[IllegalArgumentException] {
      graft.functions.BloomBuffer.sized(100, 1.5)
    }
    // scd2: empty history -> no intervals; empty batch -> state unchanged
    val noHist = Seq.empty[(String, Long, Long, Int)].toDF("key", "ts", "tie", "attr")
    assert(graft.operators.Scd2
      .fromHistory(noHist, Seq("key"), "ts", "tie", Seq("attr")).count() == 0)
    val st = graft.operators.Scd2.fromHistory(
      Seq(("a", 1L, 1L, 9)).toDF("key", "ts", "tie", "attr"),
      Seq("key"), "ts", "tie", Seq("attr"))
    val merged = graft.operators.Scd2
      .applyBatch(st, noHist, Seq("key"), "ts", "tie", Seq("attr"))
    assert(merged.count() == 1 && merged.head().getBoolean(4))
  }

  test("GraftSql.merge degrades cleanly on edge inputs") {
    // empty source: target unchanged under both statement forms
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("rtgt")
    Seq.empty[(Long, String)].toDF("k", "v").createOrReplaceTempView("rsrc_empty")
    for (stmt <- Seq(
      "MERGE INTO rtgt T USING rsrc_empty S ON T.k = S.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "MERGE INTO rtgt T USING rsrc_empty S ON T.k = S.k WHEN NOT MATCHED THEN INSERT *"))
      assert(GraftSql.merge(spark, stmt).collect().map(_.getString(1)).toSeq == Seq("a"))
    // empty target: every source row inserts
    Seq.empty[(Long, String)].toDF("k", "v").createOrReplaceTempView("rtgt_empty")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("rsrc")
    assert(GraftSql.merge(spark,
      "MERGE INTO rtgt_empty T USING rsrc S ON T.k = S.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .count() == 2)
    // source missing a target column fails at analysis, not silently
    Seq((1L, "x", 9)).toDF("k", "v", "extra").createOrReplaceTempView("rtgt3")
    intercept[Exception] {
      GraftSql.merge(spark,
        "MERGE INTO rtgt3 T USING rsrc S ON T.k = S.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
        .collect()
    }
    // unknown view name fails loudly
    intercept[Exception] {
      GraftSql.merge(spark,
        "MERGE INTO no_such_view T USING rsrc S ON T.k = S.k WHEN NOT MATCHED THEN INSERT *")
    }
  }

  test("asof join with empty right side: inner drops all, outer null-fills") {
    val left = Seq((1L, "EUR", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "cur", "ts")
    val right = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("cur", "ts", "rate")
    assert(AsOf.join(left, right, Seq("cur"), "ts", "ts", Seq("rate")).count() == 0)
    val outer = AsOf.join(left, right, Seq("cur"), "ts", "ts", Seq("rate"), inner = false)
    assert(outer.count() == 1 && outer.head().isNullAt(3))
  }

  test("SQL-registered sketch functions reject wrong arity loudly") {
    graft.functions.native.registerAll(spark)
    graft.sources.Typed.registerAllViews(spark, sf)
    for (bad <- Seq(
        "SELECT graft_cosine(array(1.0F)) FROM documents LIMIT 1",
        "SELECT graft_jaccard(array('a')) FROM documents LIMIT 1",
        "SELECT graft_minhash(split(text, ' ')) FROM documents LIMIT 1",
        "SELECT graft_simhash(split(text, ' '), 3) FROM documents LIMIT 1")) {
      val e = intercept[Exception] { spark.sql(bad).collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("arguments")), s"$bad -> $e")
    }
  }

  test("dedup banding rejects k not divisible by bands") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "doc_id", "text", k = 60, bands = 16)
    }
    assert(e.getMessage.contains("multiple of bands"))
  }

  test("GraftExtensions injects SQL functions via spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // force suite session init first
    // getOrCreate returns the live session (ignoring withExtensions), so
    // clear the active/default pointers to force a genuinely new session
    // over the same SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = GraftSession.builder(2)
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      graft.sources.Typed.registerAllViews(s2, sf)
      val out = s2.sql(
        """SELECT graft_jaccard(graft_shingles(split(lower(text), '\\s+'), 3),
          |                     graft_shingles(split(lower(text), '\\s+'), 3)) AS self_j
          |FROM documents LIMIT 3""".stripMargin).collect()
      assert(out.forall(_.getDouble(0) == 1.0))
      // extension-injected functions validate arity like registerAll does
      val arityErr = intercept[Exception] {
        s2.sql("SELECT graft_cosine(array(1.0F)) FROM documents LIMIT 1").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(arityErr).exists(_.contains("arguments")), arityErr.toString)
      // optimizer rule folds the self-similarity to a literal: the
      // optimized plan must not contain a JaccardSim call at all
      val optimized = s2.sql(
        """SELECT graft_jaccard(graft_shingles(split(lower(text), '\s+'), 3),
          |                     graft_shingles(split(lower(text), '\s+'), 3)) AS self_j
          |FROM documents""".stripMargin).queryExecution.optimizedPlan.toString
      assert(!optimized.contains("jaccardsim") && !optimized.toLowerCase.contains("jaccard"),
        optimized.take(500))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
