package graft

import graft.sources.{Layout, Tables}
import org.apache.spark.sql.{functions => F}
import java.nio.file.Files

/** Scale-shape checks: these assert on the *physical plan*, because at
  * 100 TB the plan is the contract — filters must reach the scan,
  * small dims must broadcast, dedup must never degenerate to a cross
  * join, and day-partitioned layouts must prune.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1 prunes columns: scan reads only the 7 needed of 11") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"), readSchema)
  }

  test("q5 broadcasts the small dimensions") {
    val p = plan("q5_multijoin")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup candidate generation is an equi-join, never a cross join") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated to a cross join")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degenerated to BNLJ")
    }
  }

  test("whole-stage codegen covers the q1 aggregation") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print with "*(stageId)" markers
    assert(p.contains("*(1) HashAggregate") || p.contains("*(1) Filter"), p.take(1500))
  }

  test("native sketch expressions run inside whole-stage codegen spans") {
    import graft.operators.Dedup
    // the signature projection (tokens → shingles → minhash) must fuse
    // with its stage: every plan line mentioning a native expression
    // has the "*(n)" codegen marker — no CodegenFallback boundary
    val sigs = Dedup.signatures(Tables.documents(spark, sf), "doc_id", "text")
    sigs.collect()
    val plan = sigs.queryExecution.executedPlan.toString
    val exprLines = plan.linesIterator
      .filter(l => l.contains("minhashsignature") || l.contains("wordshingles") ||
        l.contains("simhash") || l.contains("cosinesim"))
      .toSeq
    assert(exprLines.nonEmpty, plan.take(2000))
    for (l <- exprLines) // codegen'd operators carry the "*(stageId)" marker
      assert(l.contains("*("), s"native expression outside codegen span: $l")
  }

  test("MERGE with a small delta broadcasts: the target's payload never shuffles") {
    import graft.operators.Upsert
    val target = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val delta = target.limit(30) // the reference's per-run batch size
    val merged = Upsert.merge(target, delta, Seq("event_id"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    // the UPDATE half — the LeftOuter join carrying the full-width
    // target — must specifically be the broadcast join (the INSERT
    // anti-join can broadcast on its own at test scale and would mask
    // an update-half regression under a bare contains check)
    assert("BroadcastHashJoin.*LeftOuter".r.findFirstIn(plan).isDefined, plan.take(2000))
    assert("SortMergeJoin.*LeftOuter".r.findFirstIn(plan).isEmpty,
      s"update half regressed to a full-width shuffle join: ${plan.take(2000)}")
  }

  test("bucketed co-located join plans with no shuffle exchange") {
    val dir = Files.createTempDirectory("graft-bucket-").toString
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Layout.writeBucketed(o, "b_orders", s"$dir/o", 8, Seq("o_orderkey"))
    Layout.writeBucketed(l, "b_lineitem", s"$dir/l", 8, Seq("l_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the SMJ path
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") === F.col("l_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // matched bucketing on both sides ⇒ map-side merge, zero Exchange
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // sanity: the join result is correct
      assert(j.count() == Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          F.col("l_orderkey") === F.col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("dynamic partition overwrite replaces only the incoming days") {
    val out = Files.createTempDirectory("graft-dpo-").toString
    val e = Tables.events(spark, sf)
    Layout.writePartitioned(e, out, "ts", Seq("event_type"))
    val before = spark.read.parquet(out).count()
    // re-report one day with a single replacement row
    val oneDay = e.filter(F.to_date(F.col("ts")) === "2024-01-05").limit(1)
    Layout.overwriteDayPartitions(oneDay, out, "ts")
    val after = spark.read.parquet(out)
    val otherDays = after.filter(F.col("p_day") =!= "2024-01-05").count()
    val thatDay = after.filter(F.col("p_day") === "2024-01-05").count()
    assert(thatDay == 1, "overwritten day should hold only the new rows")
    assert(otherDays == before - e.filter(F.to_date(F.col("ts")) === "2024-01-05").count(),
      "untouched days must survive")
  }

  test("round-3 query plans have the right scale shape") {
    def plan(q: String): String = {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize the AQE plan
      df.queryExecution.executedPlan.toString
    }

    // JSON extraction: scan prunes to the two referenced columns, and
    // the parse is ONE projection feeding the partial aggregate (NB
    // from_json is CodegenFallback by Spark design — the Jackson parse
    // dominates either way; what matters at scale is pruning + a
    // single parse per row)
    val json = plan("q_json_extract")
    val readSchema = json.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_type") && readSchema.contains("props") &&
      !readSchema.contains("user_id"), readSchema)
    assert(json.linesIterator.exists(l => l.contains("Project") && l.contains("from_json")),
      json.take(800))

    // repetition score: map-only over the corpus — the only exchanges
    // are the final presentation sort (+ AQE reading it); no join, no
    // aggregation
    val rep = plan("text_repetition")
    assert(!rep.contains("Join") && !rep.contains("HashAggregate"), rep.take(800))

    // stratified sample: pure filter, no shuffle except the
    // presentation sort
    val strat = plan("sample_stratified")
    assert(!strat.contains("Join") && !strat.contains("HashAggregate"), strat.take(800))

    // quantized ANN: query side broadcasts; corpus never shuffles
    // full-width (bounded top-k partials carry <= k rows per partition)
    val int8 = plan("ann_bruteforce_int8")
    assert(int8.contains("BroadcastExchange"), int8.take(800))
    assert(!int8.contains("CartesianProduct") || int8.contains("BroadcastNestedLoopJoin"),
      "corpus x queries must go through the broadcast join")
  }

  test("embed and cluster-assign plans are shuffle-free map passes") {
    import graft.operators.{Clustering, Embedding}
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    // embedding generation: one map pass, zero Exchange anywhere
    val embPlan = Embedding.hashEmbedding(docs, "doc_id", "text", 16)
      .queryExecution.executedPlan.toString
    assert(!embPlan.contains("Exchange"), embPlan.take(1500))
    // cluster assignment over a trained matrix: plan-embedded
    // centroids, zero Exchange — the 100 TB predict pass
    val emb = Embedding.hashEmbedding(docs, "doc_id", "text", 16)
    val cents = Clustering.kmeansTrain(emb, k = 3, iters = 1,
      idCol = "doc_id", vecCol = "embedding")
    val assignPlan = Clustering.assignToCentroids(emb, cents,
        idCol = "doc_id", vecCol = "embedding")
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"), assignPlan.take(1500))
  }

  test("q_array_ops plans the bounded top-k aggregate, not a whole-group collect_list") {
    val df = SparkEntry.queries("q_array_ops")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("collect_list"),
      s"ARRAY_AGG(... LIMIT k) must not buffer whole groups: ${p.take(1500)}")
    assert(p.contains("top_k_payload"), p.take(1500))
    // partial aggregation runs map-side: ObjectHashAggregate appears in
    // both partial and final mode around the exchange
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("q_kll_sketch aggregates two-phase: summary-sized partials cross the exchange, not rows") {
    val df = SparkEntry.queries("q_kll_sketch")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    // the KLL INIT is a TypedImperativeAggregate: ObjectHashAggregate
    // runs partial (map-side) and final around each exchange, so what
    // shuffles is O(k·log n) sketch entries per group — never values;
    // the same shape carries MERGE_PARTIAL's second-level aggregation
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(p.contains("partial_kllinitagg") || p.contains("kllinitagg"), p.take(1500))
    assert(p.contains("kllmergepartialagg"), p.take(1500))
  }

  test("dedup_text_droplist_exact folds the LSH branch away: only the hash collapse executes") {
    val df = SparkEntry.queries("dedup_text_droplist_exact")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the reason='exact' filter pushes through the union and constant-
    // folds the near branch to an empty relation — no sketching, no
    // banding join, survives in the plan
    assert(!p.contains("minhashsignature") && !p.contains("wordshingles"), p.take(2000))
  }

  test("compactDays collapses crowded day partitions, leaves quiet days' files untouched") {
    val out = Files.createTempDirectory("graft-compact-").toString
    val e = Tables.events(spark, sf)
    val crowdedDay = "2024-01-05"
    val quiet = e.filter(F.to_date(F.col("ts")) =!= crowdedDay)
    val onDay = e.filter(F.to_date(F.col("ts")) === crowdedDay)
    assert(onDay.count() >= 10)
    Layout.writePartitioned(quiet, out, "ts", Seq("event_type", "user_id"))
    // simulate a high-cadence ingest: 10 tiny appends into one day
    val ids = onDay.select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    ids.grouped(math.max(1, ids.length / 10)).foreach { chunk =>
      Layout.appendPartitioned(onDay.filter(F.col("event_id").isInCollection(chunk)),
        out, "ts", Seq("event_type", "user_id"))
    }
    def filesIn(day: String): Array[java.io.File] =
      new java.io.File(s"$out/p_day=$day").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(filesIn(crowdedDay).length >= 10, "fixture must be fragmented")
    val quietDay = "2024-01-08"
    val quietStampsBefore = filesIn(quietDay).map(f => (f.getPath, f.length, f.lastModified)).toSet
    val before = spark.read.parquet(out).orderBy("event_id").collect().toSeq

    val compacted = Layout.compactDays(spark, out, Seq("event_type", "user_id"), maxFilesPerDay = 8)
    assert(compacted == Seq(crowdedDay), s"only the crowded day compacts, got $compacted")
    assert(filesIn(crowdedDay).length == 1, "compacted day collapses to one file")
    assert(filesIn(quietDay).map(f => (f.getPath, f.length, f.lastModified)).toSet == quietStampsBefore,
      "quiet days' files must not be rewritten")
    assert(spark.read.parquet(out).orderBy("event_id").collect().toSeq == before,
      "compaction must be a physical-only change")
    // second run is a no-op
    assert(Layout.compactDays(spark, out, Seq("event_type", "user_id"), maxFilesPerDay = 8).isEmpty)
  }

  test("compactDays skips (not deletes) a day that takes a concurrent append mid-compaction") {
    val out = Files.createTempDirectory("graft-compact-race-").toString
    val e = Tables.events(spark, sf)
    val racedDay = "2024-01-05"
    val cleanDay = "2024-01-06"
    def fragment(day: String): Unit = {
      val onDay = e.filter(F.to_date(F.col("ts")) === day)
      val ids = onDay.select("event_id").orderBy("event_id").collect().map(_.getLong(0))
      assert(ids.length >= 10)
      ids.grouped(math.max(1, ids.length / 10)).foreach { chunk =>
        Layout.appendPartitioned(onDay.filter(F.col("event_id").isInCollection(chunk)),
          out, "ts", Seq("event_type", "user_id"))
      }
    }
    fragment(racedDay); fragment(cleanDay)
    // the concurrently-landing batch: new rows for the raced day (fresh
    // ids so loss would be visible), injected between the snapshot
    // materializing and the pre-commit re-check — the exact window the
    // round-3 implementation lost rows in
    val late = e.filter(F.to_date(F.col("ts")) === racedDay)
      .limit(5).withColumn("event_id", F.col("event_id") + 10000000L)
    val lateCount = late.count()
    val beforeCount = spark.read.parquet(out).count()
    val compacted = Layout.compactDaysWithHook(spark, out, Seq("event_type", "user_id"),
      maxFilesPerDay = 8,
      afterSnapshot = () => Layout.appendPartitioned(late, out, "ts", Seq("event_type", "user_id")))
    assert(compacted == Seq(cleanDay),
      s"the raced day must be skipped, the untouched day still compacts; got $compacted")
    spark.catalog.refreshByPath(out)
    assert(spark.read.parquet(out).count() == beforeCount + lateCount,
      "the concurrent append must survive compaction")
    // with no concurrent writer, the still-crowded raced day compacts next run
    assert(Layout.compactDays(spark, out, Seq("event_type", "user_id"), maxFilesPerDay = 8)
      == Seq(racedDay))
    assert(spark.read.parquet(out).count() == beforeCount + lateCount)
  }

  test("partitioned layout writes day directories and prunes on day filters") {
    val out = Files.createTempDirectory("graft-layout-").toString
    Layout.writePartitioned(Tables.events(spark, sf), out, "ts", Seq("event_type", "user_id"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("p_day=")) > 20, dirs.mkString(","))
    val pruned = spark.read.parquet(out).filter(F.col("p_day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter present and scan limited to one partition's files
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() > 0)
  }

  test("PARTITION BY ... CLUSTER BY DDL: a day-filtered read of the created table shows PartitionFilters") {
    Tables.events(spark, sf).createOrReplaceTempView("plan_pc_events")
    GraftSql.load(spark,
      """CREATE OR REPLACE TABLE plan_pc_daily PARTITION BY DATE(ts) CLUSTER BY user_id
        |AS SELECT event_id, ts, user_id, event_type, value FROM plan_pc_events""".stripMargin)
    val pruned = spark.table("plan_pc_daily").filter(F.col("p_day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.toString
    val pf = """PartitionFilters: \[([^\]]*)\]""".r.findFirstMatchIn(scan)
    assert(pf.exists(_.group(1).contains("p_day")),
      s"day filter must land in PartitionFilters, not a row filter:\n$scan")
    assert(pruned.count() > 0)
  }

  test("filtered VECTOR_SEARCH pushes the metadata predicate into the base scan") {
    // the round-13 subquery-base spelling: the WHERE must reach the
    // parquet scan as a pushed filter — pre-filtering is the POINT of
    // the spelling (scan less, then distance-rank less)
    graft.sources.Tables.embeddings(spark, sf).createOrReplaceTempView("plan_vs_base")
    spark.sql("SELECT vec_id AS qid, embedding FROM plan_vs_base LIMIT 3")
      .createOrReplaceTempView("plan_vs_q")
    val df = GraftSql.load(spark,
      """SELECT base.vec_id AS id, distance
        |FROM VECTOR_SEARCH((SELECT * FROM plan_vs_base WHERE vec_id > 100), 'embedding',
        |                   TABLE plan_vs_q, top_k => 5, distance_type => 'COSINE')""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), GreaterThan(vec_id,100)]") ||
      p.contains("GreaterThan(vec_id,100)"), p.take(3000))
    assert(!p.contains("CartesianProduct"), "filtered search degenerated to a cross join")
  }

  test("q_date_bucket plans one aggregate pass: no Window, no Generate, codegen'd buckets") {
    val df = SparkEntry.queries("q_date_bucket")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "bucket starts must be scalar arithmetic, not windows")
    assert(!p.contains("Generate"), "bucket starts must not explode")
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("q_time_ops and q_percentile_window shuffle only on their group keys") {
    for (q <- Seq("q_time_ops", "q_percentile_window")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plan degenerated:\n${p.take(1500)}")
    }
  }

  test("sessionizeRanges plans exactly one shuffle: both window passes share the sort") {
    // the interval-merge shape: island detection (running max-end)
    // and per-island extents are two Window operators over the SAME
    // (partition keys) exchange — a second exchange would mean the
    // session-extent pass re-shuffled what the detection pass
    // already co-located
    import org.apache.spark.sql.{functions => F}
    val rows = spark.range(2000).select(
      (F.col("id") % 7).as("k"),
      F.struct(
        F.date_add(F.lit(java.sql.Date.valueOf("2024-01-01")),
          (F.col("id") % 300).cast("int")).as("range_start"),
        F.date_add(F.lit(java.sql.Date.valueOf("2024-01-01")),
          (F.col("id") % 300 + F.col("id") % 20 + 1).cast("int")).as("range_end")).as("rng"))
    val out = graft.operators.Resample.sessionizeRanges(rows, "rng", Seq("k"))
    val p = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected ONE hash exchange, got $exchanges:\n${p.take(2000)}")
    assert("Window".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("round-13 faces stay join-degeneracy-free, scans stay pruned") {
    // (no WholeStageCodegen assertion here: the AQE preview plan
    // inserts codegen per query stage at EXECUTION, so the marker is
    // absent from executedPlan.toString before a collect)
    for (q <- Seq("q_net_ip", "q_codepoints", "q_interval_ops", "q_ml_label_encode",
        "sql_range_sessionize", "q_text_analyze")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plan degenerated:\n${p.take(1500)}")
    }
    // the NET.IP face reads exactly ONE column of the 5-column events
    assert(plan("q_net_ip").contains("ReadSchema: struct<user_id:bigint>"))
  }

  test("round-14 faces: banded equi-joins, pruned scans, partial aggregation") {
    // fuzzy join: the q-gram join IS the banding — no cross-join
    // degeneracy anywhere in the candidate path
    val fz = plan("dedup_fuzzy_pairs")
    assert(!fz.contains("CartesianProduct") && !fz.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degenerated:\n${fz.take(1500)}")
    // soft dedup joins the duplicates-sized cluster map, no cross join
    val sd = plan("sample_soft_dedup")
    assert(!sd.contains("CartesianProduct") && !sd.contains("BroadcastNestedLoopJoin"))
    // geography: the scan reads exactly the two id columns (the struct
    // carrier and all trig fold into the projection), and the
    // aggregation is partial before its exchange (map-side combine)
    val st = plan("q_st_point")
    assert(st.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"), st.take(800))
    assert(st.contains("partial_count"), "no map-side partial aggregation")
    // tz and week faces are pure map passes: one exchange each (the
    // ORDER BY range partitioning), nothing else shuffles
    for (q <- Seq("q_tz_ops", "q_week_ops")) {
      val p = plan(q)
      assert("Exchange".r.findAllIn(p).size == 1, s"$q shuffles more than the sort:\n$p")
    }
  }

  test("round-15 faces: line/ring geography stays a pruned map-side-combined scan") {
    // the non-point carriers fold entirely in the projection: a
    // 2-column pruned scan, partial aggregation before the one
    // group-by exchange, and no join of any kind
    for (q <- Seq("q_st_line", "q_st_poly")) {
      val p = plan(q)
      assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"), p.take(800))
      assert(p.contains("partial_count"), s"$q: no map-side partial aggregation")
      assert(!p.contains("Join"), s"$q grew a join:\n${p.take(1200)}")
    }
    // AEAD: the nondeterministic ENCRYPT projection must stay its own
    // node (CollapseProject would re-encrypt per consuming expression
    // and the aggregate would reject nondeterminism), the aggregation
    // partial, and nothing joins
    val ae = plan("q_aead")
    assert(ae.contains("partial_count"), "q_aead: no map-side partial aggregation")
    assert(!ae.contains("Join"), s"q_aead grew a join:\n${ae.take(1200)}")
  }

  test("round-16 faces: spatial join buckets, deterministic AEAD stays map-only") {
    // the DWITHIN pair join must be the grid-cell equi-join — NEVER a
    // cartesian/broadcast-nested-loop all-pairs (the 100 TB contract)
    val sj = plan("q_st_join")
    assert(!sj.contains("CartesianProduct"), s"q_st_join went all-pairs:\n${sj.take(1200)}")
    assert(!sj.contains("BroadcastNestedLoopJoin"), s"q_st_join went BNLJ:\n${sj.take(1200)}")
    assert(sj.contains("Join"), "q_st_join lost its equi-join")
    // the predicate face folds in the projection like the other
    // geography faces: pruned scan, partial agg, no join
    for (q <- Seq("q_st_pred", "q_st_shape")) {
      val sp = plan(q)
      assert(sp.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"), sp.take(800))
      assert(sp.contains("partial_count"), s"$q: no map-side partial aggregation")
      assert(!sp.contains("Join"), s"$q grew a join:\n${sp.take(1200)}")
    }
    // the shape face's calibration filter must reach the scan
    assert(plan("q_st_shape").contains("PushedFilters"), "q_st_shape: filter not pushed")
    // deterministic AEAD: DETERMINISTIC_ENCRYPT may CSE (it is
    // deterministic — the opposite of GCM's contract) but the face
    // must stay an aggregation over a scan, no join
    val ad = plan("q_aead_det")
    assert(ad.contains("partial_count"), "q_aead_det: no map-side partial aggregation")
    assert(!ad.contains("Join"), s"q_aead_det grew a join:\n${ad.take(1200)}")
  }
}
