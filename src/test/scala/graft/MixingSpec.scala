package graft

import graft.operators.{Mixing, Sampling}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class MixingSpec extends SparkSuite {

  import spark.implicits._

  /** Skewed synthetic corpus: source sizes 6400 / 1600 / 400 / 16. */
  private lazy val corpus = {
    val rows = Seq(("web", 6400), ("books", 1600), ("code", 400), ("ref", 16))
      .flatMap { case (src, n) => (0 until n).map(i => (s"$src-$i".hashCode.toLong, src)) }
    rows.toDF("doc_id", "source")
  }

  test("temperature mix flattens the source distribution toward rare sources") {
    val kept = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2)
    val keptBySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inBySource = corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keepRate = inBySource.map { case (s, n) => s -> keptBySource.getOrElse(s, 0L).toDouble / n }
    // √-temperature: keep rate decreases with source size; both small
    // sources are oversubscribed by their √-share (want_s > n_s) and
    // cap at keep-everything — ref: 4208·4/144 = 116 > 16,
    // code: 4208·20/144 = 584 > 400
    assert(keepRate("ref") == 1.0 && keepRate("code") == 1.0, s"rates: $keepRate")
    assert(keepRate("books") < 1.0 && keepRate("books") > keepRate("web"), s"rates: $keepRate")
    // and the flattening is real: web keeps less than its proportional
    // share (1/2), books more than uniform-across-sources would give
    assert(keepRate("web") < 0.5, s"rates: $keepRate")
  }

  test("overall kept volume lands near the requested fraction") {
    val total = corpus.count()
    val kept = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2).count()
    // binomial noise per source plus the rare-source cap shortfall;
    // expected shares: each non-capped source keeps ~ target*w_s/W
    assert(kept > total * 0.40 && kept < total * 0.56,
      s"kept $kept of $total, expected ~0.5 minus cap shortfall")
  }

  test("membership is deterministic and matches the per-source threshold law") {
    val a = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    val b = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same input must give the same mix (no RNG state)")
    // recompute the thresholds driver-side and check the filter law exactly
    val counts = corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val w = counts.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong }
    val wSum = w.values.sum
    val target = total * 1 / 2
    val h = counts.map { case (s, n) =>
      s -> math.min(1L << 52,
        math.floor(target.toDouble * w(s) / wSum / n * 4503599627370496.0).toLong)
    }
    val want = corpus.select(F.col("doc_id"), F.col("source"),
        Sampling.hash52(F.col("doc_id")).as("hh"))
      .collect().filter(r => r.getLong(2) < h(r.getString(1))).map(_.getLong(0)).toSet
    assert(a == want, "engine mix must equal the closed-form threshold law")
  }

  test("null ids and null sources are excluded, not hashed") {
    val withNulls = corpus.unionByName(
      Seq((Option.empty[Long], Option("web")), (Option(123456789L), Option.empty[String]))
        .toDF("doc_id", "source"))
    val kept = Mixing.temperatureMixBySqrt(withNulls, "doc_id", "source", 1, 2)
    assert(kept.filter(F.col("doc_id").isNull || F.col("source").isNull).count() == 0)
  }

  test("knownCounts short-circuits the count scan and matches the inline path") {
    val counts = corpus.groupBy("source").agg(F.count(F.lit(1)).as("__n"))
    val inline = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    val precomputed = Mixing.temperatureMixBySqrt(corpus, "doc_id", "source", 1, 2,
        knownCounts = Some(counts))
      .select("doc_id").as[Long].collect().toSet
    assert(inline == precomputed)
  }

  test("mix plan broadcasts the threshold table (no wide shuffle of the corpus)") {
    val docs = Tables.documents(spark, sf)
    val plan = Mixing.temperatureMixBySqrt(docs, "doc_id", "source", 1, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"corpus-side join must be broadcast:\n$plan")
  }
}
