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

  /** Sized corpus for the budget face: every doc carries a size. */
  private lazy val sized = {
    val rows = Seq(("web", 400), ("books", 50), ("ref", 8))
      .flatMap { case (src, n) => (0 until n).map(i =>
        (s"$src-$i".hashCode.toLong, src, 50L + (i % 7) * 10L)) }
    rows.toDF("doc_id", "source", "n_tok")
  }

  test("mixToBudget: full epochs replicate exactly, the partial epoch meets the remainder in expectation") {
    val tot = sized.groupBy("source").agg(F.sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ref upsamples (3 full + partial), books ~1 epoch + partial,
    // web downsamples (partial only)
    val budgets = Map(
      "ref" -> (3 * tot("ref") + tot("ref") / 2),
      "books" -> (tot("books") + tot("books") / 4),
      "web" -> tot("web") / 3)
    val out = Mixing.mixToBudget(sized, "doc_id", "source", "n_tok", budgets).cache()

    // full epochs: every doc of the source appears once per epoch
    val refDocs = sized.filter($"source" === "ref").count()
    for (e <- 0 until 3)
      assert(out.filter($"source" === "ref" && $"epoch" === e).count() == refDocs,
        s"ref epoch $e must be a complete copy")
    assert(out.filter($"source" === "books" && $"epoch" === 0).count() ==
      sized.filter($"source" === "books").count())
    // partial epochs carry roughly the remainder's share of size
    def size(src: String, e: Int): Long =
      out.filter($"source" === src && $"epoch" === e)
        .agg(F.sum("n_tok")).head().getLong(0)
    val refPartial = size("ref", 3).toDouble / tot("ref")
    assert(refPartial > 0.25 && refPartial < 0.75, s"ref partial carried $refPartial (want ~0.5)")
    val webPartial = size("web", 0).toDouble / tot("web")
    assert(webPartial > 0.15 && webPartial < 0.55, s"web partial carried $webPartial (want ~0.33)")
    // no source exceeds its epoch count; epochs are dense from 0
    assert(out.filter($"source" === "web" && $"epoch" > 0).count() == 0)
    assert(out.filter($"source" === "books" && $"epoch" > 1).count() == 0)

    // determinism + subset stability: dropping OTHER sources never
    // changes a source's replica set
    val again = Mixing.mixToBudget(sized, "doc_id", "source", "n_tok", budgets)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    val refOnly = Mixing.mixToBudget(sized.filter($"source" === "ref"),
      "doc_id", "source", "n_tok", Map("ref" -> budgets("ref")))
    val refFromFull = out.filter($"source" === "ref")
    assert(refOnly.exceptAll(refFromFull).count() == 0 &&
      refFromFull.exceptAll(refOnly).count() == 0)
    out.unpersist()
  }

  test("mixToBudget: exact-multiple budgets emit no partial epoch; louds fire") {
    val tot = sized.groupBy("source").agg(F.sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Mixing.mixToBudget(sized, "doc_id", "source", "n_tok",
      Map("ref" -> 2 * tot("ref")))
    assert(out.groupBy("epoch").count().collect().map(r =>
      r.getInt(0) -> r.getLong(1)).toMap ==
      Map(0 -> sized.filter($"source" === "ref").count(),
          1 -> sized.filter($"source" === "ref").count()))

    // unnamed sources are dropped entirely
    assert(out.filter($"source" =!= "ref").count() == 0)

    // louds: typo'd source, epoch explosion, non-positive budget
    val e1 = intercept[IllegalArgumentException] {
      Mixing.mixToBudget(sized, "doc_id", "source", "n_tok", Map("wep" -> 10L))
    }
    assert(e1.getMessage.contains("wep"))
    val e2 = intercept[IllegalArgumentException] {
      Mixing.mixToBudget(sized, "doc_id", "source", "n_tok",
        Map("ref" -> 1000000L * tot("ref")), maxEpochs = 100)
    }
    assert(e2.getMessage.contains("maxEpochs"))
    intercept[IllegalArgumentException] {
      Mixing.mixToBudget(sized, "doc_id", "source", "n_tok", Map("ref" -> 0L))
    }
    // zero-total source: the budget cannot be met — loud, not a
    // silent divide-by-zero NULL allocation
    val zeroed = Seq((1L, "empty", 0L)).toDF("doc_id", "source", "n_tok")
    val e3 = intercept[IllegalArgumentException] {
      Mixing.mixToBudget(zeroed, "doc_id", "source", "n_tok", Map("empty" -> 10L))
    }
    assert(e3.getMessage.contains("zero"))
  }
}
