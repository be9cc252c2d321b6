package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Classifier evaluation — the harness every trained data-filter
  * (E14/E14b/E18, or any score column) needs before its threshold
  * goes into a pipeline gate: sweep every operating point and report
  * the confusion counts + precision/recall at each.
  *
  * Scale shape (the part a naive window-over-rows gets wrong): rows
  * first collapse to ONE COUNT PAIR PER DISTINCT SCORE (a keyed
  * aggregate with map-side partials — the corpus is touched once),
  * and the cumulative confusion sweep runs as a window over the
  * SCORE-LEVEL frame, which is bounded by |distinct scores| — for
  * integer-vote classifiers a few thousand rows, never the corpus.
  * Continuous scores with corpus-cardinality distincts route through
  * `buckets = Some(b)`: scores collapse into `b` equal-width bins
  * between the observed min and max (computed in the same totals
  * pass — no extra job), each reported at its LOWER EDGE, so the
  * sweep frame is bounded by `b` regardless of score cardinality —
  * the histogram-PR approximation every production eval uses.
  *
  * Contract: labels are +1/−1 (the E14b convention; anything else is
  * loud, counted in one pass), prediction at threshold t is
  * `score >= t`, and every distinct score is an operating point —
  * plus the "predict nothing" point at threshold = max+1 is implicit
  * in reading the curve from the top. Output: one row per distinct
  * score, ordered by threshold DESC, with exact integer confusion
  * counts and their IEEE-exact ratio columns — every quantity
  * replays bit-for-bit in a SQL oracle.
  *
  * Reference anchor: the evaluation step of the published
  * quality-classifier recipes (CCNet/fastText filters are tuned by
  * exactly this sweep); SURVEY.md §2 E-block companion.
  */
object Eval {

  /** Exact ROC AUC via the Mann-Whitney rank statistic with average
    * ties — the threshold-free companion to [[binaryPrCurve]] (AUC is
    * what the published filter recipes actually report).
    *
    * Same scale shape as the curve: one keyed aggregate collapses the
    * corpus to a count pair per DISTINCT score, then the rank fold
    * runs over that bounded frame. All arithmetic stays in INTEGERS
    * doubled to clear the half-rank: a tie group g with c_g rows
    * preceded by cum_g rows has average rank cum_g + (c_g + 1)/2, so
    *
    *   2·R₁ = Σ_g p_g · (2·cum_g + c_g + 1)
    *   2·U₁ = 2·R₁ − n₁(n₁ + 1)
    *   AUC  = 2·U₁ / (2·n₁·n₀)
    *
    * — one exactly-rounded double division at the very end, so the
    * value replays bit-for-bit in a SQL oracle (and equals the
    * pair-counting definition: P(s⁺ > s⁻) + ½P(s⁺ = s⁻), spec-pinned
    * against an all-pairs reference). Long arithmetic holds to
    * n ≈ 10⁹ rows (2·R₁ < 2n²); beyond that, pre-bucket scores.
    *
    * Output: ONE row — (pos, neg, n_points, u_x2, auc). Labels +1/−1
    * (loud otherwise); degenerate inputs (no positives or no
    * negatives) yield NULL auc rather than a 0/0.
    */
  def binaryRocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val rows = df.select(F.col(labelCol).cast("long").as("__y"),
      F.col(scoreCol).cast("double").as("__s"))
      .filter(F.col("__y").isNotNull && F.col("__s").isNotNull)
    val tot = rows.agg(
      F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("__pos"),
      F.sum(F.when(F.col("__y") === -1L, 1L).otherwise(0L)).as("__neg"),
      F.count(F.lit(1)).as("__n")).head()
    val (pos, neg, n) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    require(n > 0, "binaryRocAuc: empty input")
    require(pos + neg == n,
      s"binaryRocAuc: labels must be +1/-1 (found ${n - pos - neg} other values)")
    val perScore = rows.groupBy(F.col("__s"))
      .agg(F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("__p"),
        F.count(F.lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(F.col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val r1x2 = perScore
      .withColumn("__cum", F.coalesce(F.sum("__c").over(w), F.lit(0L)))
      .agg(F.sum(F.col("__p") * (F.lit(2L) * F.col("__cum") + F.col("__c") + F.lit(1L)))
        .as("__r1x2"), F.count(F.lit(1)).as("__points")).head()
    val ux2 = r1x2.getLong(0) - pos * (pos + 1L)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((pos, neg, r1x2.getLong(1), ux2)).toDF("pos", "neg", "n_points", "u_x2")
      .withColumn("auc",
        if (pos == 0L || neg == 0L) F.lit(null).cast("double")
        else F.col("u_x2").cast("double") / F.lit(2.0 * pos.toDouble * neg.toDouble))
  }

  /** Reliability diagram — the calibration companion to the sweep:
    * scores bucket into `bins` equal-width bins between the observed
    * min and max (the [[binaryPrCurve]] edge arithmetic: floor /
    * multiply / divide, single IEEE ops, bit-replayable in SQL), each
    * reported at its LOWER EDGE with exact integer counts and the
    * positive fraction as one integer-ratio division. A well-
    * calibrated scorer has frac_pos tracking the bin position; this
    * frame is what that judgment reads. Same scale shape as the
    * sweep: one totals pass, one keyed aggregate, a `bins`-bounded
    * result. Labels +1/−1 (loud otherwise); an all-equal score column
    * degrades to the single raw-score bin.
    */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    val rows = df.select(F.col(labelCol).cast("long").as("__y"),
      F.col(scoreCol).cast("double").as("__s"))
      .filter(F.col("__y").isNotNull && F.col("__s").isNotNull)
    val tot = rows.agg(
      F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("__pos"),
      F.sum(F.when(F.col("__y") === -1L, 1L).otherwise(0L)).as("__neg"),
      F.count(F.lit(1)).as("__n"),
      F.min("__s").as("__lo"), F.max("__s").as("__hi")).head()
    val n = tot.getLong(2)
    require(n > 0, "calibrationBins: empty input")
    require(tot.getLong(0) + tot.getLong(1) == n,
      s"calibrationBins: labels must be +1/-1 (found ${n - tot.getLong(0) - tot.getLong(1)} other values)")
    val (lo, hi) = (tot.getDouble(3), tot.getDouble(4))
    val keyed = if (lo < hi) {
      val width = (hi - lo) / bins
      val bucket = F.least(
        F.floor((F.col("__s") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1L))
      rows.select(F.col("__y"),
        (F.lit(lo) + bucket.cast("double") * F.lit(width)).as("bin_lo"))
    } else rows.select(F.col("__y"), F.col("__s").as("bin_lo"))
    keyed.groupBy("bin_lo")
      .agg(F.count(F.lit(1)).as("n"),
        F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("frac_pos",
        F.col("n_pos").cast("double") / F.col("n").cast("double"))
      .orderBy("bin_lo")
  }

  def binaryPrCurve(df: DataFrame, labelCol: String, scoreCol: String,
                    buckets: Option[Int] = None): DataFrame = {
    buckets.foreach(b => require(b >= 1, s"buckets must be positive, got $b"))
    val spark = df.sparkSession
    val rows = df.select(F.col(labelCol).cast("long").as("__y"),
      F.col(scoreCol).cast("double").as("__s"))
      .filter(F.col("__y").isNotNull && F.col("__s").isNotNull)
    // label validation + score range in the same pass as the totals
    // (no second job)
    val tot = rows.agg(
      F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("__pos"),
      F.sum(F.when(F.col("__y") === -1L, 1L).otherwise(0L)).as("__neg"),
      F.count(F.lit(1)).as("__n"),
      F.min("__s").as("__lo"), F.max("__s").as("__hi")).head()
    val n = tot.getLong(2)
    require(n > 0, "binaryPrCurve: empty input")
    val (pos, neg) = (tot.getLong(0), tot.getLong(1))
    require(pos + neg == n,
      s"binaryPrCurve: labels must be +1/-1 (found ${n - pos - neg} other values)")
    // the operating-point key: the raw score, or its bucket's lower
    // edge — floor/multiply/divide are single IEEE ops, so the edges
    // replay bit-for-bit in a SQL oracle spelled the same way
    val keyed = buckets match {
      case Some(b) if tot.getDouble(3) < tot.getDouble(4) =>
        val lo = tot.getDouble(3)
        val width = (tot.getDouble(4) - lo) / b
        val bucket = F.least( // max score lands in the top bucket
          F.floor((F.col("__s") - F.lit(lo)) / F.lit(width)), F.lit(b - 1L))
        rows.select(F.col("__y"),
          (F.lit(lo) + bucket.cast("double") * F.lit(width)).as("threshold"))
      case _ => // unbucketed, or all scores equal (width 0): raw key
        rows.select(F.col("__y"), F.col("__s").as("threshold"))
    }
    // one count pair per distinct operating point — the
    // corpus-touching pass
    val perScore = keyed.groupBy(F.col("threshold"))
      .agg(F.sum(F.when(F.col("__y") === 1L, 1L).otherwise(0L)).as("__p"),
        F.sum(F.when(F.col("__y") === -1L, 1L).otherwise(0L)).as("__q"))
    // cumulative sweep over the bounded score-level frame: at
    // threshold t, positives-predicted = all rows with score >= t
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(F.col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perScore
      .withColumn("tp", F.sum("__p").over(w))
      .withColumn("fp", F.sum("__q").over(w))
      .withColumn("fn", F.lit(pos) - F.col("tp"))
      .withColumn("tn", F.lit(neg) - F.col("fp"))
      .withColumn("precision",
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"))
      .withColumn("recall",
        if (pos == 0) F.lit(null).cast("double")
        else F.col("tp").cast("double") / F.lit(pos.toDouble))
      .select("threshold", "tp", "fp", "fn", "tn", "precision", "recall")
  }
}
