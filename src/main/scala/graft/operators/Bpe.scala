package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.{native, text}

/** Byte-pair-encoding vocabulary induction — the tokenizer-training
  * step of an LLM data pipeline, distributed the way the algorithm
  * wants to be distributed:
  *
  *  - The corpus is touched ONCE, to build the word-frequency
  *    dictionary (one explode + one keyed aggregation). Everything
  *    after runs on that dictionary, whose size is the corpus's
  *    distinct-word vocabulary — at 100 TB of text that is ~10⁸ rows,
  *    not 10¹² (Sennrich et al. 2016 train on exactly this dict; so
  *    do the fast reference implementations).
  *  - Merge rounds are BATCHED (round 11): one pair-count aggregation
  *    over the dictionary (explode adjacent symbol pairs weighted by
  *    word frequency, sum per pair — map-side partials collapse it)
  *    yields a top-(m+1) driver read, from which the round keeps the
  *    maximal SORTED PREFIX of symbol-disjoint pairs, minus any
  *    trailing pairs tying the first excluded weight — a set provably
  *    merged by vanilla one-at-a-time BPE in exactly this order (see
  *    [[bestPairs]]); the whole batch then applies in ONE map-only
  *    [[graft.functions.MergePairs]] pass. Driver round-trips drop
  *    from `rounds` to ~`rounds/|batch|` (natural-language top pairs
  *    are mostly disjoint), killing the last sequential-jobs
  *    bottleneck at production vocab sizes (30–50k merges).
  *  - Lineage truncates through [[Staging]] every `stageEvery`
  *    rounds: `None` → localCheckpoint (single JVM), `Some(dir)` →
  *    durable parquet stages (executor-loss-safe on a real cluster).
  *
  * Encoding with the learned table ([[encode]]) applies merges in
  * rank order ([[graft.functions.ApplyBpe]]) — encoding a training
  * word reproduces its end-of-training symbols exactly (the BPE
  * round-trip invariant; BpeSpec pins it, plus exact equality of the
  * whole merge table against an independent driver-side reference
  * implementation).
  *
  * A learned merge CAN straddle word boundaries in no case: words are
  * the tokenization unit, per the whitespace pre-tokenizer
  * ([[graft.functions.text.tokens]]) — the same convention GPT-2-era
  * BPE uses. No end-of-word marker is added; add one upstream (suffix
  * the words) if the downstream tokenizer needs boundary-aware units.
  */
object Bpe {

  /** (pair-left, pair-right, merged, weight) merge table with 1-based
    * `rank` — the training artifact. `rounds` bounds the table size;
    * training stops early when no adjacent pair repeats.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            checkpointDir: Option[String] = None,
            stageEvery: Int = 5, batch: Int = 32,
            byteLevel: Boolean = false): Seq[(String, String, Long)] = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    require(stageEvery > 0, s"stageEvery must be positive, got $stageEvery")
    require(batch > 0, s"batch must be positive, got $batch")
    // the single corpus pass: word-frequency dictionary
    val words = docs
      .select(F.explode(text.tokens(F.col(textCol))).as("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .groupBy("__w").agg(F.count(F.lit(1)).as("__n"))
    // stage the dictionary UP FRONT: every pair aggregation below
    // re-executes its lineage, and without this stage that lineage is
    // the full corpus tokenize — the "corpus touched once" contract
    // needs the plan to actually truncate here (round 11; the first
    // round-trip used to pay the corpus scan once per aggregation)
    var symbols = Staging.stage(
      words.select(initialSymbols(byteLevel).as("__sym"), F.col("__n")),
      checkpointDir.map(d => s"$d/bpe"), "dict")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var trips = 0 // driver round-trips, for the staging cadence
    var exhausted = false
    var prevStage: Option[String] = None
    while (merges.size < rounds && !exhausted) {
      val kept = bestPairs(symbols, math.min(batch, rounds - merges.size))
      if (kept.isEmpty) exhausted = true
      else {
        merges ++= kept
        symbols = symbols.select(
          native.merge_pairs(F.col("__sym"), kept.map(p => (p._1, p._2)))
            .as("__sym"), F.col("__n"))
        trips += 1
        if (trips % stageEvery == 0 && merges.size < rounds) {
          symbols = Staging.stage(symbols, checkpointDir.map(d => s"$d/bpe"), s"round_$trips")
          // superseded stages are ours to drop (Staging ownership
          // contract) — the new stage has materialized, and nothing
          // we return reads the old one (train returns driver data)
          checkpointDir.foreach { d =>
            prevStage.foreach(p => Staging.drop(docs.sparkSession, p))
            prevStage = Some(s"$d/bpe/round_$trips")
          }
        }
      }
    }
    merges.toSeq
  }

  /** The initial symbol array of a dictionary word (column `__w`).
    * Char level splits to characters; BYTE level (round 15 — the
    * GPT-2-family production regime, with byte fallback by
    * construction) splits the word's UTF-8 bytes, each carried as its
    * fixed-width 2-hex-digit token. Fixed width makes plain string
    * concatenation (`a + b`, what MergePairs/ApplyBpe and the merged
    * column already do) EXACTLY byte-sequence concatenation — the
    * whole char-level merge machinery, batching proof included, lifts
    * unchanged, and the DuckDB oracle replays hex(encode(w)) the same
    * way it replays the char split. Upper-case hex on both engines.
    */
  private[graft] def initialSymbols(byteLevel: Boolean): org.apache.spark.sql.Column =
    if (byteLevel)
      F.expr("transform(sequence(1, octet_length(__w)), " +
        "i -> substr(hex(CAST(__w AS BINARY)), 2 * i - 1, 2))")
    else F.array_remove(F.split(F.col("__w"), ""), "")

  /** The next batch of merges, EXACTLY the pairs vanilla one-at-a-time
    * BPE would pick next, in its order. One aggregation over adjacent
    * pairs (weight = Σ word-frequency over occurrences; ties to the
    * lexicographically smallest pair — deterministic), top-(m+1) rows
    * to the driver; keep the maximal sorted PREFIX that is pairwise
    * symbol-disjoint, then drop trailing pairs tying the first
    * excluded weight. Soundness: (1) merging a pair never increases
    * any existing pair's count and every NEW pair (x,ab)/(ab,y) is
    * bounded by a pre-merge pair count that CONFLICTS with the merged
    * pair — and every conflicting pair sits at-or-after the stop
    * position, so its count ≤ the first excluded weight; (2) kept
    * pairs are mutually disjoint, so their counts are untouched by
    * each other's merges; (3) after the tie-drop every kept weight
    * STRICTLY exceeds anything a merge could promote. Hence vanilla's
    * next |kept| picks are these pairs in this order (BpeSpec pins
    * batched ≡ batch=1 on a conflict-heavy corpus). Pairs with weight
    * 1 never merge (a merge that fires once compresses nothing).
    */
  private def bestPairs(symbols: DataFrame, m: Int): Seq[(String, String, Long)] = {
    val rows = symbols
      .filter(F.size(F.col("__sym")) >= 2)
      .select(F.col("__n"), F.explode(F.arrays_zip(
        F.slice(F.col("__sym"), 1, Int.MaxValue).as("a"),
        F.slice(F.col("__sym"), 2, Int.MaxValue).as("b"))).as("__p"))
      .filter(F.col("__p.b").isNotNull) // zip pads the shorter (shifted) side
      .groupBy(F.col("__p.a").as("a"), F.col("__p.b").as("b"))
      .agg(F.sum("__n").as("w"))
      .filter(F.col("w") >= 2)
      .orderBy(F.col("w").desc, F.col("a"), F.col("b"))
      .limit(m + 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    if (rows.isEmpty) return Nil
    val used = scala.collection.mutable.Set.empty[String]
    val concats = scala.collection.mutable.Set.empty[String]
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var excluded: Option[Long] = None // weight where the prefix stopped
    rows.foreach { case p @ (a, b, w) =>
      if (excluded.isEmpty) {
        // conflicts: shared member symbols, AND concatenation
        // aliasing — a member that IS a kept pair's output (the
        // single combined pass would miss adjacencies of the
        // just-merged symbol) or an output that IS a kept pair's
        // member (the kept pair would consume what this one makes).
        // Unreachable from single-char alphabets, but multi-char
        // initial symbols make it live — guard keeps batched ≡
        // sequential airtight.
        val clash = used(a) || used(b) || concats(a) || concats(b) || used(a + b)
        if (kept.size == m || clash) excluded = Some(w)
        else { kept += p; used += a; used += b; concats += a + b }
      }
    }
    excluded match {
      case None => kept.toSeq // the pair list is COMPLETE: every
        // conflicting pair has weight < 2 and can never be merged
      case Some(we) =>
        val safe = kept.takeWhile(_._3 > we)
        // P1 alone is always vanilla's next pick, tie or not
        if (safe.isEmpty) kept.take(1).toSeq else safe.toSeq
    }
  }

  /** The merge table as a DataFrame (rank, left, right, merged,
    * weight) — the persistable training artifact and the driver-query
    * surface.
    */
  def mergeTable(docs: DataFrame, textCol: String, rounds: Int,
                 checkpointDir: Option[String] = None,
                 byteLevel: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, rounds, checkpointDir, byteLevel = byteLevel).zipWithIndex
      .map { case ((a, b, w), i) => (i + 1, a, b, a + b, w) }
      .toDF("rank", "left", "right", "merged", "weight")
  }

  /** Per-document BPE token count under a learned merge table —
    * map-only (tokens → chars → ApplyBpe), the real-tokenizer upgrade
    * of `text.bpeishCount`.
    */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame =
    docs
      .select(F.col(idCol), F.explode(text.tokens(F.col(textCol))).as("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .select(F.col(idCol),
        F.size(native.apply_bpe(
          F.array_remove(F.split(F.col("__w"), ""), ""), merges)).as("__k"))
      .groupBy(idCol).agg(F.sum("__k").as("n_bpe_tokens"))

  /** Encode one symbol column with the learned merges (rank order). */
  def encode(symbols: org.apache.spark.sql.Column,
             merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    native.apply_bpe(symbols, merges)
}
