package graft

import graft.operators.Eval
import org.apache.spark.sql.{functions => F}

class EvalSpec extends SparkSuite {

  import spark.implicits._

  test("binaryPrCurve matches a driver-side reference sweep; ties collapse; partition-invariant") {
    // hand fixture: scores with ties, labels mixed
    val rows = Seq(
      (1L, 0.9), (1L, 0.8), (-1L, 0.8), (1L, 0.5), (-1L, 0.5), (-1L, 0.5),
      (1L, 0.2), (-1L, 0.1))
    val df = rows.toDF("y", "s")
    val got = Eval.binaryPrCurve(df, "y", "s")
      .orderBy(F.desc("threshold")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))

    // reference: for each distinct score t desc, predict positive iff s >= t
    val pos = rows.count(_._1 == 1L)
    val neg = rows.count(_._1 == -1L)
    val want = rows.map(_._2).distinct.sorted.reverse.map { t =>
      val tp = rows.count(r => r._2 >= t && r._1 == 1L).toLong
      val fp = rows.count(r => r._2 >= t && r._1 == -1L).toLong
      (t, tp, fp, pos - tp, neg - fp, tp.toDouble / (tp + fp), tp.toDouble / pos)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // one row per DISTINCT score (ties collapse to one operating point)
    assert(got.length == rows.map(_._2).distinct.size)
    // recall is monotone non-increasing as threshold rises
    assert(got.map(_._7).toSeq == got.map(_._7).sorted.toSeq)

    // partition invariance
    val again = Eval.binaryPrCurve(df.repartition(7), "y", "s")
      .orderBy(F.desc("threshold")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.map(g => (g._1, g._2, g._3)).toSeq)

    // louds: a non-±1 label, empty input
    val e = intercept[IllegalArgumentException] {
      Eval.binaryPrCurve(Seq((0L, 1.0)).toDF("y", "s"), "y", "s")
    }
    assert(e.getMessage.contains("+1/-1"))
    intercept[IllegalArgumentException] {
      Eval.binaryPrCurve(Seq.empty[(Long, Double)].toDF("y", "s"), "y", "s")
    }
  }

  test("binaryPrCurve on classifier output: the E14 integer-vote scores sweep cleanly") {
    // scores from the classifier-shape fold: label by a token rule the
    // score partially tracks — the curve must start precise and end at
    // recall 1.0
    val docs = graft.sources.Tables.documents(spark, sf)
    val scored = docs.select(
      F.when(F.col("text").contains("data"), 1L).otherwise(-1L).as("y"),
      F.col("n_chars").cast("double").as("s"))
    val curve = Eval.binaryPrCurve(scored, "y", "s").orderBy(F.desc("threshold")).collect()
    assert(curve.nonEmpty)
    // the lowest threshold predicts everything positive: recall 1.0,
    // precision = base rate
    val last = curve.last
    val pos = scored.filter(F.col("y") === 1L).count()
    val n = scored.count()
    assert(last.getDouble(6) == 1.0)
    assert(math.abs(last.getDouble(5) - pos.toDouble / n) < 1e-12)
    // confusion identities hold on every row
    curve.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) == pos)
      assert(r.getLong(2) + r.getLong(4) == n - pos)
    }
  }

  test("binaryPrCurve buckets: corpus-cardinality scores collapse to <= b operating points") {
    // 400 distinct continuous scores — the unbounded-distinct case
    // the buckets knob exists for
    val rows = (0 until 400).map(i => (if (i % 3 == 0) 1L else -1L, i / 7.0))
    val df = rows.toDF("y", "s")
    val b = 16
    val got = Eval.binaryPrCurve(df, "y", "s", buckets = Some(b))
      .orderBy(F.desc("threshold")).collect()
    assert(got.length <= b && got.length > 1, s"got ${got.length} rows")
    // driver-side reference with the SAME edge arithmetic
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val width = (hi - lo) / b
    def edge(s: Double): Double = lo + math.min(math.floor((s - lo) / width), (b - 1).toDouble) * width
    val pos = rows.count(_._1 == 1L)
    val want = rows.map(r => edge(r._2)).distinct.sorted.reverse.map { t =>
      val tp = rows.count(r => edge(r._2) >= t && r._1 == 1L).toLong
      val fp = rows.count(r => edge(r._2) >= t && r._1 == -1L).toLong
      (t, tp, fp)
    }
    assert(got.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq == want)
    // full-recall identity survives bucketing: the bottom edge
    // predicts everything positive
    assert(got.last.getDouble(6) == 1.0)
    // buckets=1: one operating point, everything predicted positive
    val one = Eval.binaryPrCurve(df, "y", "s", buckets = Some(1)).collect()
    assert(one.length == 1 && one.head.getLong(1) == pos)
    // all-equal scores: bucketing degrades to the single raw point
    val flat = Eval.binaryPrCurve(
      Seq((1L, 2.0), (-1L, 2.0)).toDF("y", "s"), "y", "s", buckets = Some(8)).collect()
    assert(flat.length == 1 && flat.head.getDouble(0) == 2.0)
  }

  test("binaryRocAuc: rank AUC equals the all-pairs definition, ties averaged") {
    // heavy ties by construction: scores are i % 5
    val rows = (0 until 200).map(i => (if (i % 3 == 0) 1L else -1L, (i % 5).toDouble))
    val df = rows.toDF("y", "s")
    val got = Eval.binaryRocAuc(df, "y", "s").head()
    val posS = rows.filter(_._1 == 1L).map(_._2)
    val negS = rows.filter(_._1 == -1L).map(_._2)
    // the pair-counting definition: P(s+ > s-) + 0.5 P(s+ = s-)
    val wins = (for (p <- posS; q <- negS) yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = wins / (posS.size.toDouble * negS.size.toDouble)
    assert(got.getLong(0) == posS.size && got.getLong(1) == negS.size)
    assert(got.getLong(2) == 5L) // distinct scores
    assert(math.abs(got.getDouble(4) - want) < 1e-12, s"auc ${got.getDouble(4)} vs $want")
    // perfect separation = 1.0; inverted = 0.0; degenerate = NULL
    val sep = Seq((1L, 9.0), (1L, 8.0), (-1L, 1.0), (-1L, 2.0)).toDF("y", "s")
    assert(Eval.binaryRocAuc(sep, "y", "s").head().getDouble(4) == 1.0)
    val inv = Seq((1L, 1.0), (-1L, 9.0)).toDF("y", "s")
    assert(Eval.binaryRocAuc(inv, "y", "s").head().getDouble(4) == 0.0)
    val deg = Seq((1L, 1.0), (1L, 2.0)).toDF("y", "s")
    assert(Eval.binaryRocAuc(deg, "y", "s").head().isNullAt(4))
    // bad labels are loud
    assertThrows[IllegalArgumentException] {
      Eval.binaryRocAuc(Seq((0L, 1.0)).toDF("y", "s"), "y", "s").collect()
    }
  }

  test("calibrationBins: reliability bins with the PR-curve edge arithmetic") {
    val rows = (0 until 300).map(i => (if (i % 4 == 0) 1L else -1L, (i % 50) / 2.0))
    val df = rows.toDF("y", "s")
    val b = 8
    val got = Eval.calibrationBins(df, "y", "s", bins = b).collect()
    // driver-side reference with the SAME edge arithmetic
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val width = (hi - lo) / b
    def edge(s: Double): Double = lo + math.min(math.floor((s - lo) / width), (b - 1).toDouble) * width
    val want = rows.map(r => edge(r._2)).distinct.sorted.map { e =>
      val in = rows.filter(r => edge(r._2) == e)
      (e, in.size.toLong, in.count(_._1 == 1L).toLong)
    }
    assert(got.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq == want)
    assert(got.forall(r => r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble))
    assert(got.map(_.getLong(1)).sum == 300L)
    // all-equal scores degrade to one raw bin; bad labels loud
    val flat = Eval.calibrationBins(Seq((1L, 5.0), (-1L, 5.0)).toDF("y", "s"), "y", "s")
    assert(flat.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq == Seq((5.0, 2L)))
    assertThrows[IllegalArgumentException] {
      Eval.calibrationBins(Seq((2L, 1.0)).toDF("y", "s"), "y", "s").collect()
    }
  }
}
