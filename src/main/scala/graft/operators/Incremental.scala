package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Incremental aggregate maintenance — the 100 TB answer to the
  * reference's report cadence. The reference re-runs its aggregation
  * SQL over the whole table every cycle (idempotent_fx_pipeline.py's
  * report DAG); at 100 TB that rescan is the cost ceiling. Instead,
  * keep a *partial-aggregate state table* of mergeable measures and
  * fold each ingest batch into it: the update reads O(batch) new rows
  * plus the touched state rows, never the raw history. Raw events can
  * expire to cold storage; the state table alone answers the report.
  *
  * Measures are mergeable by construction, encoded in the COLUMN NAME
  * suffix (the schema is the merge contract, so state tables persist
  * and reload without side metadata):
  *   - `*_sum` — additive (use decimal types for exact, order-free sums)
  *   - `*_cnt` — additive row counts
  *   - `*_min` / `*_max` — least / greatest
  *   - `*_hll` — Datasketches HLL union (`hll_sketch_agg` binaries), the
  *     mergeable COUNT(DISTINCT): register-max is commutative and
  *     idempotent, so re-merges and re-ordered batches cannot drift
  *
  * AVG is derived at read time as `*_sum / *_cnt` — never stored, so it
  * stays exact under merging.
  *
  * `merge` never shuffles the (large) state payload: the combine half
  * is `state LEFT JOIN broadcast(delta)` (state streams map-side), and
  * the new-key half anti-joins the delta against the state's slim key
  * projection — the same decomposition as [[Upsert.merge]]. Every
  * combined column is cast back to the state column's exact type, so
  * the schema cannot drift across merges (decimal addition would
  * otherwise widen precision by one digit per merge).
  *
  * `broadcastDelta` (default true) matches the common shape — a day's
  * partials over a bounded key space. When the key space is itself
  * huge (per-user `_hll` state: the delta carries one sketch per user
  * seen in the batch, easily past broadcast capacity), set it false:
  * the combine half becomes a shuffle-hash join on the keys and the
  * result is bit-identical — same rows, same types, just an exchange
  * of the delta instead of a driver-side broadcast that would OOM.
  * (The [[InvertedIndex.tfidf]] `broadcastIdf` recipe.)
  */
object Incremental {

  /** Aggregate one batch into partial-aggregate rows (one per key). */
  def partials(batch: DataFrame, keys: Seq[String], measures: Seq[Column]): DataFrame =
    batch.groupBy(keys.map(F.col): _*).agg(measures.head, measures.tail: _*)

  private def combine(name: String, s: Column, d: Column): Column =
    name match {
      case n if n.endsWith("_sum") || n.endsWith("_cnt") =>
        F.when(d.isNull, s).when(s.isNull, d).otherwise(s + d)
      case n if n.endsWith("_min") => F.least(s, d)    // null-skipping, like MIN
      case n if n.endsWith("_max") => F.greatest(s, d)
      case n if n.endsWith("_hll") =>
        F.when(d.isNull, s).when(s.isNull, d).otherwise(F.hll_union(s, d))
      case n => throw new IllegalArgumentException(
        s"measure column '$n' has no mergeable suffix (_sum/_cnt/_min/_max/_hll)")
    }

  /** Fold a batch's `partials` into the state table. Output schema ==
    * state schema, bit-exact on untouched rows.
    *
    * CONTRACT: both frames carry one row per key — `partials` output,
    * not raw rows. A delta with duplicate keys would silently fan out
    * the combine join (each state row merged once per duplicate);
    * aggregate first. Checking here would cost a count per merge, so
    * the contract is documented, not enforced.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
            broadcastDelta: Boolean = true): DataFrame = {
    require(state.columns.toSeq == delta.columns.toSeq,
      s"state/delta schema mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val measures = state.columns.filterNot(keys.contains).toSeq
    val d = if (broadcastDelta) F.broadcast(delta) else delta.hint("shuffle_hash")
    val cond = keys.map(k => F.col(s"s.$k") <=> F.col(s"d.$k")).reduce(_ && _)
    val combined = state.as("s").join(d.as("d"), cond, "left").select(
      keys.map(k => F.col(s"s.$k").as(k)) ++
        measures.map { m =>
          combine(m, F.col(s"s.$m"), F.col(s"d.$m")).cast(state.schema(m).dataType).as(m)
        }: _*)
    // new keys: anti-join against the state's slim key projection only
    // — the state payload never enters this shuffle. Null-safe like the
    // combine half: a null group key is one group, not a fresh row.
    val freshCond = keys.map(k => F.col(s"b.$k") <=> F.col(s"t.$k")).reduce(_ && _)
    val fresh = delta.as("b")
      .join(state.select(keys.map(F.col): _*).as("t"), freshCond, "left_anti")
    combined.unionByName(fresh)
  }

  /** Merge-chain convenience: fold many batch partials left to right.
    *
    * Every intermediate state is STAGED ([[Staging]]: localCheckpoint
    * by default, durable parquet stages under `stagingDir` on a
    * cluster): `merge` reads its state twice (combine join + slim-key
    * anti), so an unstaged k-fold chain would embed each earlier
    * merge's plan in both halves of the next — re-executing the first
    * fold's work ~2^(k-1) times. Staging makes each fold run once.
    * Ownership follows the [[Staging]] contract: intermediates are
    * dropped as soon as the next fold materializes; the last fold's
    * stage backs the returned frame, so the caller deletes
    * `stagingDir` when done with the result.
    */
  def mergeAll(parts: Seq[DataFrame], keys: Seq[String],
               stagingDir: Option[String] = None,
               broadcastDelta: Boolean = true): DataFrame = {
    require(parts.nonEmpty, "mergeAll needs at least one partials frame")
    parts.tail.zipWithIndex.foldLeft(parts.head) { case (state, (delta, i)) =>
      val folded = Staging.stage(
        merge(state, delta, keys, broadcastDelta), stagingDir, s"state-${i + 1}")
      stagingDir.foreach(d => if (i > 0) Staging.drop(folded.sparkSession, s"$d/state-$i"))
      folded
    }
  }
}
