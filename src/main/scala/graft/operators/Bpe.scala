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
  *  - Each merge round is one pair-count aggregation over the
  *    dictionary (explode adjacent symbol pairs weighted by word
  *    frequency, sum per pair — map-side partials collapse it) plus
  *    one map-only [[graft.functions.MergePair]] pass. The round
  *    winner is a single driver-side row (count desc, pair asc —
  *    deterministic ties), the only thing the driver ever holds.
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
            stageEvery: Int = 5): Seq[(String, String, Long)] = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    require(stageEvery > 0, s"stageEvery must be positive, got $stageEvery")
    // the single corpus pass: word-frequency dictionary
    val words = docs
      .select(F.explode(text.tokens(F.col(textCol))).as("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .groupBy("__w").agg(F.count(F.lit(1)).as("__n"))
    var symbols = words.select(
      F.array_remove(F.split(F.col("__w"), ""), "").as("__sym"), F.col("__n"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var exhausted = false
    var prevStage: Option[String] = None
    while (round < rounds && !exhausted) {
      val top = bestPair(symbols)
      top match {
        case None => exhausted = true
        case Some((a, b, w)) =>
          merges += ((a, b, w))
          symbols = symbols.select(
            native.merge_pair(F.col("__sym"), a, b).as("__sym"), F.col("__n"))
          round += 1
          if (round % stageEvery == 0 && round < rounds) {
            symbols = Staging.stage(symbols, checkpointDir.map(d => s"$d/bpe"), s"round_$round")
            // superseded stages are ours to drop (Staging ownership
            // contract) — the new stage has materialized, and nothing
            // we return reads the old one (train returns driver data)
            checkpointDir.foreach { d =>
              prevStage.foreach(p => Staging.drop(docs.sparkSession, p))
              prevStage = Some(s"$d/bpe/round_$round")
            }
          }
      }
    }
    merges.toSeq
  }

  /** Highest-weight adjacent pair (weight = Σ word-frequency over
    * occurrences), ties to the lexicographically smallest pair so
    * training is deterministic. One aggregation; the driver sees one
    * row. Pairs with weight 1 never merge (a merge that fires once
    * compresses nothing and pads the vocabulary).
    */
  private def bestPair(symbols: DataFrame): Option[(String, String, Long)] = {
    val pairs = symbols
      .filter(F.size(F.col("__sym")) >= 2)
      .select(F.col("__n"), F.explode(F.arrays_zip(
        F.slice(F.col("__sym"), 1, Int.MaxValue).as("a"),
        F.slice(F.col("__sym"), 2, Int.MaxValue).as("b"))).as("__p"))
      .filter(F.col("__p.b").isNotNull) // zip pads the shorter (shifted) side
      .groupBy(F.col("__p.a").as("a"), F.col("__p.b").as("b"))
      .agg(F.sum("__n").as("w"))
      .filter(F.col("w") >= 2)
      .orderBy(F.col("w").desc, F.col("a"), F.col("b"))
      .limit(1)
      .collect()
    pairs.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** The merge table as a DataFrame (rank, left, right, merged,
    * weight) — the persistable training artifact and the driver-query
    * surface.
    */
  def mergeTable(docs: DataFrame, textCol: String, rounds: Int,
                 checkpointDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, rounds, checkpointDir).zipWithIndex
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
