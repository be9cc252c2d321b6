package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Declarative data-quality constraints — the assertion layer every
  * warehouse load runs before publishing (BigQuery `ASSERT`, dbt
  * tests, Deequ checks): not-null, unique key, value range, free-form
  * predicate, referential integrity. The reference pipeline's
  * check-then-act idempotency guard is the same idea specialized to
  * one rule; this generalizes it into a reusable gate.
  *
  * Scale shape: every ROW-LOCAL rule (not-null / range / predicate)
  * compiles to a conditional count inside ONE aggregate over ONE scan
  * of the table — checking ten such rules on 100 TB costs one pass,
  * not ten. `Unique` adds one keyed aggregate (map-side partials);
  * `RefIntegrity` one anti-join (broadcast when the dimension allows,
  * AQE otherwise). Results union into a tiny (rule, violations)
  * report — no row data leaves the executors unless a caller asks
  * for `violations()` samples.
  */
object Constraints {

  sealed trait Rule { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** `lo <= col <= hi` on non-null values (NULLs are NotNull's job). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Arbitrary row predicate that must hold (NULL counts as a
    * violation — an unprovable assertion is a failed assertion).
    */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies($label)"
  }
  /** The key tuple must identify at most one row; a violation is any
    * ROW sharing its key with another (so 3 rows on one key = 3).
    * NULL-bearing keys are skipped (SQL UNIQUE semantics).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null key tuple must exist in `ref` (foreign key). */
  final case class RefIntegrity(cols: Seq[String], ref: DataFrame, refCols: Seq[String])
      extends Rule {
    def name = s"ref_integrity(${cols.mkString(",")})"
  }

  private def violationCond(r: Rule): Column = r match {
    case NotNull(c) => F.col(c).isNull
    case InRange(c, lo, hi) => F.col(c).isNotNull && (F.col(c) < lo || F.col(c) > hi)
    case Satisfies(_, p) => !F.coalesce(p, F.lit(false))
    case _ => throw new IllegalArgumentException(s"not a row-local rule: $r")
  }

  /** (rule, violations) report, one row per rule, ordered by rule
    * name. Row-local rules share one scan; each Unique/RefIntegrity
    * adds its own bounded-output aggregate/join.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val dupNames = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dupNames.isEmpty,
      s"duplicate rule names (each name is a report row): ${dupNames.mkString(", ")}")
    val (rowLocal, structural) = rules.partition {
      case _: NotNull | _: InRange | _: Satisfies => true
      case _ => false
    }
    val parts = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      val counts = rowLocal.map(r =>
        F.coalesce(F.sum(F.when(violationCond(r), 1L).otherwise(0L)), F.lit(0L)).as(r.name))
      // one scan, n conditional sums; unpivot the single row to (rule, violations)
      val row = df.agg(counts.head, counts.tail: _*)
      parts += row.unpivot(Array.empty, rowLocal.map(r => F.col(s"`${r.name}`")).toArray,
        "rule", "violations")
    }
    structural.foreach {
      case Unique(cols) =>
        val key = cols.map(F.col)
        val dupRows = df
          .filter(cols.map(F.col(_).isNotNull).reduce(_ && _))
          .groupBy(key: _*).agg(F.count(F.lit(1)).as("__c"))
          .filter(F.col("__c") > 1)
          .agg(F.coalesce(F.sum("__c"), F.lit(0L)).as("violations"))
        parts += dupRows.select(F.lit(Unique(cols).name).as("rule"), F.col("violations"))
      case r @ RefIntegrity(cols, ref, refCols) =>
        val orphans = df
          .filter(cols.map(F.col(_).isNotNull).reduce(_ && _))
          .select(cols.map(F.col): _*)
          .join(ref.select(refCols.zip(cols).map { case (rc, c) => F.col(rc).as(c) }: _*),
            cols, "left_anti")
          .agg(F.count(F.lit(1)).as("violations"))
        parts += orphans.select(F.lit(r.name).as("rule"), F.col("violations"))
      case other => throw new IllegalArgumentException(s"unhandled rule: $other")
    }
    parts.result().reduce(_ unionByName _).orderBy("rule")
  }

  /** Gate face: throws with the full report when any rule is violated
    * — the check-then-publish pattern as one call.
    */
  def assertAll(df: DataFrame, rules: Seq[Rule]): Unit = {
    val report = check(df, rules).filter(F.col("violations") > 0).collect()
    if (report.nonEmpty)
      throw new IllegalStateException(
        "constraint violations: " +
          report.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }

  /** The violating rows themselves for one row-local rule — the debug
    * face (bounded by `limit`).
    */
  def violations(df: DataFrame, rule: Rule, limit: Int = 100): DataFrame =
    df.filter(violationCond(rule)).limit(limit)

  /** Row-level routing face: every row gains a `violated` array of the
    * ROW-LOCAL rule names it breaks (empty = clean). One map-only
    * projection — the conditional array is evaluated beside the scan,
    * no shuffle, no second pass — so a quarantine split
    * (`size(violated) = 0` vs `> 0`) costs the scan it was already
    * paying. Structural rules (Unique/RefIntegrity) have no
    * single-row blame and are rejected loudly; run [[check]] for
    * those.
    */
  def annotate(df: DataFrame, rules: Seq[Rule], outCol: String = "violated"): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    rules.foreach {
      case _: NotNull | _: InRange | _: Satisfies => ()
      case r => throw new IllegalArgumentException(
        s"annotate takes row-local rules only (structural rule ${r.name} has no per-row blame)")
    }
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val flags = rules.map(r => F.when(violationCond(r), F.lit(r.name)))
    df.withColumn(outCol, F.array_compact(F.array(flags: _*)))
  }
}
