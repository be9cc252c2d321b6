package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Range (interval) join — attach to every left "point" row each right
  * interval `[lo, hi)` that contains it, optionally under extra
  * equi-keys. The second temporal-join shape the reference's BigQuery
  * SQL surface supports (`ON p.x >= r.lo AND p.x < r.hi`) alongside
  * the as-of join ([[AsOf]]).
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(|L|·|R|) work
  * that is the canonical 100 TB cliff. The scale-safe composition is
  * the published binning rewrite (DuckDB's IEJoin and Databricks'
  * range-join hints do the same under the hood): quantize the domain
  * into width-`w` bins, explode each interval onto the bins it
  * overlaps, map each point to its single bin, and run an ordinary
  * shuffled equi-join on `(keys…, bin)` followed by the exact
  * predicate. With `w >= max(hi - lo)` every interval lands on at most
  * 2 bins, so the build side is replicated ≤2× and the join work is
  * O(|L| + 2|R| + |output|) — linear, shuffle-partitioned, and
  * AQE-skew-splittable like any other equi-join.
  *
  * Each matching (point, interval) pair is emitted exactly once: a
  * point has exactly one bin, and an interval appears at most once per
  * bin — no post-join dedup is needed.
  */
object RangeJoin {

  /** @param points    left side; all its columns survive
    * @param intervals right side: (keys ++ lo ++ hi ++ payload); its
    *                  column names must not collide with `points`'
    * @param point     numeric (or date/timestamp-cast-to-numeric)
    *                  probe column on `points`
    * @param lo,hi     interval bounds on `intervals`; match is
    *                  `lo <= point < hi` (half-open, the BigQuery /
    *                  sessionization convention)
    * @param keys      extra equi-join keys present on BOTH sides
    * @param binWidth  bin width; pass the table-stats `max(hi - lo)`
    *                  at scale (a 100 TB caller knows its max session
    *                  length). None = derive it with one tiny agg over
    *                  `intervals` — fine locally, an extra job at scale.
    */
  def join(points: DataFrame, intervals: DataFrame, point: String,
           lo: String, hi: String, keys: Seq[String] = Nil,
           binWidth: Option[Double] = None): DataFrame = {
    val w = binWidth.getOrElse {
      val m = intervals.agg(F.max(F.col(hi).cast("double") - F.col(lo).cast("double"))).head()
      if (m.isNullAt(0)) 1.0 else math.max(m.getDouble(0), Double.MinPositiveValue)
    }
    require(w > 0, s"binWidth must be positive, got $w")
    def bin(c: org.apache.spark.sql.Column) = F.floor(c.cast("double") / w).cast("long")
    // interval → one row per overlapped bin (≤ ceil(len/w)+1 rows; ≤2
    // when w >= max interval length). hi is exclusive, but a point in
    // [lo, hi) can still fall in hi's bin, so the bin range is inclusive.
    // explicit aliases: points and intervals are routinely projections
    // of the SAME table (a self-range-join), where unqualified key
    // equality would resolve trivially true. Inverted intervals
    // (lo > hi) can never match but would make `sequence` DESCEND —
    // one corrupt row exploding into |binLo−binHi| rows — so they are
    // dropped up front (a semantic no-op, a robustness necessity).
    val rBinned = intervals.filter(F.col(lo) <= F.col(hi)).withColumn("__bin",
      F.explode(F.sequence(bin(F.col(lo)), bin(F.col(hi))))).alias("__r")
    val lBinned = points.withColumn("__bin", bin(F.col(point))).alias("__l")
    val cond = (Seq("__bin") ++ keys)
      .map(k => F.col(s"__l.$k") === F.col(s"__r.$k")).reduce(_ && _)
    lBinned.join(rBinned, cond)
      .filter(F.col(s"__l.$point") >= F.col(s"__r.$lo") && F.col(s"__l.$point") < F.col(s"__r.$hi"))
      .select(points.columns.map(c => F.col(s"__l.$c").as(c)) ++
        intervals.columns.filterNot(keys.contains).map(c => F.col(s"__r.$c").as(c)): _*)
  }

  /** Interval×interval overlap join — pair every left interval
    * `[lLo, lHi)` with each right interval `[rLo, rHi)` it overlaps
    * (`l.lo < r.hi AND r.lo < l.hi`, the half-open convention),
    * optionally under extra equi-keys. The session-overlap /
    * contamination-window shape: "which right-side windows intersect
    * each left-side window" — the next temporal join BigQuery users
    * write after point-in-interval.
    *
    * Same binning rewrite as [[join]], applied to BOTH sides: each
    * interval explodes onto the bins it covers (≤2 rows each when
    * `w >= max interval length` over both inputs), the join is an
    * ordinary shuffled equi-join on `(keys…, bin)`, and the exact
    * overlap predicate filters after. An overlapping pair can share
    * MANY bins, so emission is deduplicated by the bin-OWNERSHIP rule:
    * the pair is emitted only from the bin containing
    * `greatest(l.lo, r.lo)` — the start of the intersection, which by
    * construction lies in both intervals' bin ranges — so each pair
    * appears exactly once without any post-join distinct (a distinct
    * would shuffle the whole output; the ownership filter is free).
    *
    * EMPTY intervals (`lo >= hi`) are dropped on both sides: a
    * zero-length window overlaps nothing under the strict predicate,
    * and inverted bounds would make `sequence` descend (the [[join]]
    * robustness note).
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  keys: Seq[String] = Nil,
                  binWidth: Option[Double] = None): DataFrame = {
    val w = binWidth.getOrElse {
      def maxLen(df: DataFrame, lo: String, hi: String): Double = {
        val m = df.agg(F.max(F.col(hi).cast("double") - F.col(lo).cast("double"))).head()
        if (m.isNullAt(0)) 1.0 else m.getDouble(0)
      }
      math.max(math.max(maxLen(left, lLo, lHi), maxLen(right, rLo, rHi)),
        Double.MinPositiveValue)
    }
    require(w > 0, s"binWidth must be positive, got $w")
    def bin(c: org.apache.spark.sql.Column) = F.floor(c.cast("double") / w).cast("long")
    val lBinned = left.filter(F.col(lLo) < F.col(lHi)).withColumn("__bin",
      F.explode(F.sequence(bin(F.col(lLo)), bin(F.col(lHi))))).alias("__l")
    val rBinned = right.filter(F.col(rLo) < F.col(rHi)).withColumn("__bin",
      F.explode(F.sequence(bin(F.col(rLo)), bin(F.col(rHi))))).alias("__r")
    val cond = (Seq("__bin") ++ keys)
      .map(k => F.col(s"__l.$k") === F.col(s"__r.$k")).reduce(_ && _)
    lBinned.join(rBinned, cond)
      .filter(F.col(s"__l.$lLo") < F.col(s"__r.$rHi") &&
        F.col(s"__r.$rLo") < F.col(s"__l.$lHi"))
      // ownership: exactly the bin holding the intersection's start
      .filter(F.col("__l.__bin") ===
        bin(F.greatest(F.col(s"__l.$lLo"), F.col(s"__r.$rLo"))))
      .select(left.columns.map(c => F.col(s"__l.$c").as(c)) ++
        right.columns.filterNot(keys.contains).map(c => F.col(s"__r.$c").as(c)): _*)
  }
}
