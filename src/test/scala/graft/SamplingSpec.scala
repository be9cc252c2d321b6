package graft

import graft.operators.Sampling
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class SamplingSpec extends SparkSuite {

  test("perKeyDeterministic keeps at most k rows per key, deterministically") {
    val e = Tables.events(spark, sf)
    val s1 = Sampling.perKeyDeterministic(e, Seq("user_id"), "event_id", 3)
    val s2 = Sampling.perKeyDeterministic(e, Seq("user_id"), "event_id", 3)
    val counts = s1.groupBy("user_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 3))
    // keys with >= 3 rows yield exactly 3
    val bigKeys = e.groupBy("user_id").count().filter(F.col("count") >= 3).count()
    assert(counts.count(_.getLong(1) == 3) == bigKeys)
    // repeatable: same input, same sample (no RNG state)
    assert(s1.collect().toSet == s2.collect().toSet)
  }

  test("perKeyDeterministicRows returns the SAME sample with full rows, no join-back") {
    val e = Tables.events(spark, sf)
    val rows = Sampling.perKeyDeterministicRows(e, Seq("user_id"), "event_id", 3)
    assert(rows.columns.toSeq == e.columns.toSeq, "full original schema")
    val viaJoin = Sampling.perKeyDeterministic(e, Seq("user_id"), "event_id", 3)
      .select("event_id").join(e, "event_id")
      .select(e.columns.map(F.col).toSeq: _*)
    assert(rows.collect().map(_.toString).toSet == viaJoin.collect().map(_.toString).toSet)
  }

  test("sample matches a window row_number over the same hash order") {
    val e = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(Sampling.hash52(F.col("event_id")), F.col("event_id"))
    val want = e.select(F.col("user_id"), F.col("event_id"),
        F.row_number().over(w).as("rn"))
      .filter(F.col("rn") <= 3).select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Sampling.perKeyDeterministic(e, Seq("user_id"), "event_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "bounded aggregate must equal the window formulation")
  }

  test("splitByHash is a partition, roughly at the requested fraction, stable under subsets") {
    val docs = Tables.documents(spark, sf)
    val split = Sampling.splitByHash(docs, "doc_id", 9, 10)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    assert(counts.values.sum == total, "split must be a partition")
    val trainFrac = counts.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac far from 0.9")
    // incremental stability: a document's split never depends on the rest
    val subset = Sampling.splitByHash(docs.filter(F.col("doc_id") < 100), "doc_id", 9, 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = split.filter(F.col("doc_id") < 100)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset == full)
  }

  test("kFold: exhaustive fold partition, balanced, seed-independent, subset-stable") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val folded = Sampling.kFold(docs, "doc_id", k = 5, seed = 7L)
    val counts = folded.groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every row in exactly one fold 0..k-1
    assert(counts.keySet.subsetOf((0L until 5L).toSet))
    assert(counts.values.sum == total)
    // uniform hash → folds balance (generous ±50% bar at fixture n)
    counts.values.foreach(n =>
      assert(n > total / 10 && n < total * 3 / 10, s"unbalanced folds: $counts"))
    // a different seed re-deals SOME rows (independent foldings)
    val other = Sampling.kFold(docs, "doc_id", k = 5, seed = 8L)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = folded.select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base.exists { case (id, f) => other(id) != f })
    // incremental stability: a document's fold never depends on the rest
    val subset = Sampling.kFold(docs.filter(F.col("doc_id") < 100), "doc_id", 5, 7L)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(subset == base.filter(_._1 < 100))
    intercept[IllegalArgumentException](Sampling.kFold(docs, "doc_id", k = 1))
  }

  test("stratifiedByHash: per-stratum fractions, exact membership, subset-stable") {
    val e = Tables.events(spark, sf)
    val fr = Map("purchase" -> ((1, 1)), "click" -> ((1, 10)), "view" -> ((3, 10)))
    val s = Sampling.stratifiedByHash(e, "event_id", "event_type", fr, defaultFraction = (1, 2))
    val kept = s.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = e.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("purchase") == total("purchase"), "1/1 stratum keeps every row")
    val clickFrac = kept.getOrElse("click", 0L).toDouble / total("click")
    assert(clickFrac > 0.03 && clickFrac < 0.2, s"click fraction $clickFrac far from 0.1")
    val errFrac = kept.getOrElse("error", 0L).toDouble / total("error")
    assert(errFrac > 0.35 && errFrac < 0.65, s"default 1/2 fraction broken: $errFrac")
    // membership is exactly the hash rule — a row's fate is a pure
    // function of (id, stratum), independent of the rest of the corpus
    val subset = Sampling.stratifiedByHash(
        e.filter(F.col("event_id") < 500), "event_id", "event_type", fr, (1, 2))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val full = s.filter(F.col("event_id") < 500)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(subset == full, "stratified membership must be subset-stable")
  }

  test("topFractionByScore: kept/dropped partition cleanly at the per-key threshold") {
    val docs = Tables.documents(spark, sf)
      .withColumn("score", F.length(F.col("text")).cast("double"))
    val kept = Sampling.topFractionByScore(docs, Seq("source"), "score", 0.5, exact = true)
    // per key: every kept score >= every dropped score; kept count is
    // at least half (ties only ever keep MORE)
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy("source").agg(F.max("score").as("mx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val minKept = kept.groupBy("source").agg(F.min("score").as("mn"), F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- totals) {
      val (mn, nk) = minKept(src)
      maxDropped.get(src).foreach(mx => assert(mn >= mx, s"$src: kept min $mn < dropped max $mx"))
      assert(nk >= n / 2, s"$src: kept $nk of $n")
    }
  }

  test("topFractionByScore sketch path tracks the exact path and broadcasts the thresholds") {
    val docs = Tables.documents(spark, sf)
      .withColumn("score", F.length(F.col("text")).cast("double"))
    val approx = Sampling.topFractionByScore(docs, Seq("source"), "score", 0.5)
    approx.collect()
    assert(approx.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // high-accuracy sketch on small keys: same kept fraction ±5%
    val exactN = Sampling.topFractionByScore(docs, Seq("source"), "score", 0.5, exact = true).count()
    val approxN = approx.count()
    assert(math.abs(approxN - exactN).toDouble / exactN < 0.05, s"$approxN vs $exactN")
    // deterministic: the sketch is seeded by the data alone
    assert(approxN == Sampling.topFractionByScore(docs, Seq("source"), "score", 0.5).count())
  }

  test("topFractionByScore prunes a null-key group like any other (regression)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("a"), 10.0), (2L, Some("a"), 1.0),
      (3L, Option.empty[String], 10.0), (4L, Option.empty[String], 1.0))
      .toDF("doc_id", "source", "score")
    val kept = Sampling.topFractionByScore(docs, Seq("source"), "score", 0.5, exact = true)
      .select("doc_id").as[Long].collect().toSet
    // a plain-equality join-back would silently drop docs 3 and 4
    assert(kept == Set(1L, 3L))
    assert(kept.map(_.toString).nonEmpty) // schema survived the aliased select
  }

  test("apportionedSample: exactly k rows, Hamilton-quota per group, deterministic") {
    val docs = Tables.documents(spark, sf)
    val k = 97 // prime, so remainders are exercised
    val got = Sampling.apportionedSample(docs, Seq("source"), "doc_id", k)
    val perSource = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.sum == k, s"default weights = counts: sample is exactly k=$k")
    // Hamilton satisfies quota: each group's allocation is within 1 of k*n/N
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    for ((s, n) <- counts) {
      val exact = k.toDouble * n / total
      val a = perSource.getOrElse(s, 0L).toDouble
      assert(a >= math.floor(exact) && a <= math.ceil(exact),
        s"source $s: alloc $a violates quota (exact $exact)")
    }
    // RNG-free: identical across runs
    val again = Sampling.apportionedSample(docs, Seq("source"), "doc_id", k)
    assert(got.collect().toSet == again.collect().toSet)
  }

  test("apportionedSample: caller weights drive allocation; exhausted group caps at its size") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 4) "tiny" else "big")).toDF("id", "g")
    // weight tiny 9x big: wants 45 of 50 slots but only has 4 rows
    val w = Seq(("tiny", 9L), ("big", 1L)).toDF("g", "weight")
    val got = Sampling.apportionedSample(df, Seq("g"), "id", 50, Some(w))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("tiny") == 4L, "allocation capped at group size, no borrowing")
    assert(got("big") == 5L, "big keeps its own Hamilton share (50*1/10)")
    // a group absent from the weight table gets nothing
    val w2 = Seq(("big", 1L)).toDF("g", "weight")
    val only = Sampling.apportionedSample(df, Seq("g"), "id", 10, Some(w2))
    assert(only.select("g").distinct().collect().map(_.getString(0)).toSeq == Seq("big"))
    assert(only.count() == 10L)
  }

  test("apportionedSample shuffles the corpus exactly once (alloc broadcasts)") {
    val docs = Tables.documents(spark, sf)
    val plan = Sampling.apportionedSample(docs, Seq("source"), "doc_id", 50)
      .queryExecution.executedPlan.toString
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected one corpus shuffle, got $shuffles:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      "alloc table must broadcast, not shuffle the corpus again")
  }

  test("apportionedSample draw matches perKeyDeterministic's hash order") {
    val docs = Tables.documents(spark, sf)
    val got = Sampling.apportionedSample(docs, Seq("source"), "doc_id", 40)
    val perSource = got.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // each group's draw must be a PREFIX of the group's md5 order
    val order = Sampling.perKeyDeterministic(docs, Seq("source"), "doc_id", 40)
      .withColumn("h", Sampling.hash52(F.col("doc_id")))
      .orderBy("source", "h", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((s, ids) <- perSource)
      assert(ids == order(s).take(ids.size).toSet,
        s"source $s: sample is not the hash-order prefix")
  }

  test("sampled row IS the md5-argmin of each key (pins the hash family)") {
    import java.security.MessageDigest
    def refHash(i: Long): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13), 16)
    val e = Tables.events(spark, sf)
    val perUser = e.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sampled = Sampling.perKeyDeterministic(e, Seq("user_id"), "event_id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == perUser.keySet)
    for ((u, ids) <- perUser)
      assert(sampled(u) == ids.minBy(i => (refHash(i), i)),
        s"user $u: sampler disagrees with reference md5 argmin")
  }

  test("softDedup: singletons always kept, members gate on the exact integer threshold") {
    import org.apache.spark.sql.{functions => F}
    import java.security.MessageDigest
    def refHash(i: Long): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13), 16)
    val spark2 = spark
    import spark2.implicits._
    val corpus = (1L to 400L).toDF("id")
    // a synthetic cluster map: ids 1..60 in clusters of size 3, 61..100 size 40
    val clusters = ((1L to 60L).map(i => (i, ((i - 1) / 3) * 3 + 1, 3L)) ++
      (61L to 100L).map(i => (i, 61L, 40L))).toDF("id", "root", "cluster_size")
    val out = Sampling.softDedup(corpus, "id", clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out.size == 400)
    // singletons (101..400) are all kept
    assert(out.filter(_._1 > 100).forall { case (_, sz, kept) => sz == 1 && kept })
    // members gate exactly on hash < 2^52 div size — the reference replay
    for ((id, sz, kept) <- out.filter(_._1 <= 100))
      assert(kept == (refHash(id) < (1L << 52) / sz),
        s"id $id size $sz: threshold disagrees with the md5 reference")
    // expectation sanity: size-40 cluster keeps FAR fewer than size-3 ones
    val kept40 = out.count { case (id, _, k) => id >= 61 && id <= 100 && k }
    val kept3 = out.count { case (id, _, k) => id <= 60 && k }
    assert(kept40 <= 6 && kept3 >= 10 && kept3 <= 30,
      s"kept40=$kept40 kept3=$kept3 out of expectation bands")
    // determinism under repartitioning
    val out2 = Sampling.softDedup(corpus.repartition(7), "id", clusters.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out2 == out.toSet)
  }
}
