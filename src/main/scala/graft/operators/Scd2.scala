package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension type 2 — the warehouse pattern behind the
  * reference's MERGE upsert family, extended to keep HISTORY: instead
  * of overwriting a key's row (SCD1 = `Upsert.merge`, A3), each
  * attribute change closes the current validity interval and opens a
  * new one, so point-in-time queries (`AsOf`, A9) can reconstruct any
  * past state. BigQuery spells this as a MERGE with a
  * matched-AND-changed UPDATE (close) plus an INSERT (reopen); here
  * it's a library operator over plain DataFrames.
  *
  * Rows carry `valid_from` (first observation of the attribute
  * tuple), `valid_to` (next change's timestamp, null while current)
  * and `is_current`. Consecutive observations with UNCHANGED
  * attributes collapse into one interval (run-length encoding of the
  * history); ties order by a caller-named unique `tieCol` so every
  * interval boundary is deterministic.
  *
  * Scale shape: `fromHistory` is two window functions over the SAME
  * (keys) partitioning and (ts, tie) order — Catalyst plans ONE
  * exchange and one sort, then both windows run in place. No
  * groupBy, no self-join, no per-key state beyond the window frame.
  * `applyBatch` is the incremental face: closed intervals are
  * IMMUTABLE (the point of SCD2), so it touches only each key's open
  * row plus the batch — O(open ∪ batch) work per tick regardless of
  * history depth, the same append-only contract as `DedupIndex`.
  */
object Scd2 {

  /** Run starts with the tie column retained — the internal shape
    * [[applyBatch]] needs so same-timestamp observations keep their
    * (ts, tie) order through the re-collapse.
    */
  private def runStarts(history: DataFrame, keys: Seq[String], tsCol: String,
                        tieCol: String, attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs must be non-empty")
    val w = Window.partitionBy(keys.map(F.col): _*).orderBy(F.col(tsCol), F.col(tieCol))
    val attrStruct = F.struct(attrs.map(F.col): _*)
    // run starts: first observation per key (lag is null — null-safe
    // equality makes that a change) or any attribute-tuple change
    history
      .withColumn("__changed", !(attrStruct <=> F.lag(attrStruct, 1).over(w)))
      .filter(F.col("__changed"))
      .select(keys.map(F.col) ++ attrs.map(F.col) ++ Seq(
        F.col(tsCol).as("valid_from"), F.col(tieCol).as("__tie")): _*)
  }

  private def chainIntervals(starts: DataFrame, keys: Seq[String],
                             attrs: Seq[String]): DataFrame = {
    // same partitioning + (valid_from, tie) order as the run-start
    // window -> Catalyst reuses one exchange and one sort
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("valid_from"), F.col("__tie"))
    starts
      .withColumn("valid_to", F.lead(F.col("valid_from"), 1).over(w))
      .select(keys.map(F.col) ++ attrs.map(F.col) ++ Seq(
        F.col("valid_from"),
        F.col("valid_to"),
        F.col("valid_to").isNull.as("is_current")): _*)
  }

  /** Interval table from a full observation history. `attrs` are the
    * tracked columns; other non-key columns are dropped (they'd make
    * "changed" ambiguous). Output: keys ++ attrs ++ (valid_from,
    * valid_to, is_current).
    */
  def fromHistory(history: DataFrame, keys: Seq[String], tsCol: String,
                  tieCol: String, attrs: Seq[String]): DataFrame =
    chainIntervals(runStarts(history, keys, tsCol, tieCol, attrs), keys, attrs)

  /** Fold a later batch of observations into an existing interval
    * table. Precondition (caller-guaranteed, as in a warehouse's
    * append-only load): every batch timestamp is strictly later than
    * the open interval's `valid_from` for its key — late-arriving
    * data needs a history rebuild for the affected keys
    * (`fromHistory` over those keys' full observation history; closed
    * intervals are derived state, so the rebuild is always possible
    * from the retained observations).
    *
    * A violation does NOT fail on its own — it silently re-orders the
    * re-collapse and corrupts the affected key's intervals. Set
    * `assertNoLateData = true` to enforce the precondition: one slim
    * aggregate (per-key min batch ts vs the open row's `valid_from` —
    * key columns only, the state payload is untouched) that THROWS
    * [[IllegalStateException]] listing the violating key count before
    * anything is written. It runs an eager Spark job at call time,
    * which is why it is opt-in rather than always-on.
    *
    * Result is EXACTLY `fromHistory(history ∪ batch)` (spec-pinned):
    * the batch run-length-encodes on its own, then stitches to each
    * key's open interval — an unchanged leading run EXTENDS the open
    * interval (no spurious version), a changed one closes it. Closed
    * intervals pass through untouched, so on append-only storage
    * only open rows + batch are rewritten.
    */
  def applyBatch(current: DataFrame, batch: DataFrame, keys: Seq[String], tsCol: String,
                 tieCol: String, attrs: Seq[String],
                 assertNoLateData: Boolean = false): DataFrame = {
    if (assertNoLateData) {
      val late = batch
        .groupBy(keys.map(F.col): _*).agg(F.min(F.col(tsCol)).as("__batch_min"))
        .join(current.filter(F.col("is_current"))
          .select(keys.map(F.col) :+ F.col("valid_from").as("__open_from"): _*), keys)
        .filter(F.col("__batch_min") <= F.col("__open_from"))
        .count()
      if (late > 0) throw new IllegalStateException(
        s"applyBatch precondition violated: $late key(s) carry batch observations at or " +
          s"before their open interval's valid_from; rebuild those keys via fromHistory")
    }
    val closed = current.filter(!F.col("is_current"))
    val batchRuns = runStarts(batch, keys, tsCol, tieCol, attrs)
    // the open row sorts strictly before every batch run (its
    // valid_from is earlier by precondition), so its tie value never
    // matters — a typed null keeps the union schema aligned
    val tieType = batchRuns.schema("__tie").dataType
    val open = current.filter(F.col("is_current"))
      .select(keys.map(F.col) ++ attrs.map(F.col) ++ Seq(
        F.col("valid_from"), F.lit(null).cast(tieType).as("__tie")): _*)
    // re-run the run-collapse over (open ∪ batch runs): each input row
    // is itself a run boundary candidate, ordered by (valid_from,
    // tie) — the SAME total order the full-history recompute uses, so
    // same-timestamp batch observations keep their tie order;
    // adjacent equal attribute tuples collapse (keeping the EARLIER
    // valid_from — the extend case), unequal ones chain valid_to
    val combined = open.unionByName(batchRuns)
    chainIntervals(runStarts(combined, keys, "valid_from", "__tie", attrs), keys, attrs)
      .unionByName(closed.select(
        keys.map(F.col) ++ attrs.map(F.col) ++
          Seq(F.col("valid_from"), F.col("valid_to"), F.col("is_current")): _*))
  }
}
