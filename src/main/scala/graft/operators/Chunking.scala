package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Fixed-budget sliding-window document chunking — the
  * embedding/retrieval prep stage (and the long-document fallback in
  * a training pipeline: models embed or attend over bounded windows,
  * corpora don't). Splits each document into windows of
  * `chunkTokens` whitespace tokens advancing by
  * `chunkTokens - overlapTokens`, so consecutive chunks share
  * `overlapTokens` tokens of context.
  *
  * Contract (all integer arithmetic, so a SQL oracle replays it
  * exactly):
  *  - a document of n ≤ chunkTokens tokens is ONE chunk;
  *  - otherwise chunks start at 0, step, 2·step, … and the LAST chunk
  *    is the first one reaching the end (start + chunkTokens ≥ n) —
  *    every chunk but the last is exactly chunkTokens long, the last
  *    is longer than overlapTokens (it starts `step` past a window
  *    that did NOT reach the end);
  *  - blank documents (all-whitespace text) produce no chunks;
  *  - tokenization is the corpus-wide trim+regex-split whitespace
  *    convention (functions.text.tokens, E3), original case kept.
  *
  * Scale shape: map-only — one projection with an in-row explode, no
  * shuffle, no per-doc state beyond the token array already in the
  * row. Fan-out is n/step chunks per document, bounded by the text
  * itself; whole-stage codegen holds the split + slice + join in one
  * stage. 100 TB of documents chunk at scan speed.
  */
object Chunking {

  /** (doc, chunk_id, n_tokens, chunk_len, chunk_text) rows; `idCol`
    * and any `payloadCols` (source, lang — the provenance an
    * embedding pipeline must keep per chunk) are carried through,
    * other columns dropped.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int,
                    payloadCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val step = chunkTokens - overlapTokens

    val toks = F.split(F.trim(F.col(textCol)), "\\s+")
    val withToks = docs
      .filter(F.length(F.trim(F.col(textCol))) > 0)
      .select(F.col(idCol) +: payloadCols.map(F.col) :+
        toks.as("__toks") :+ F.size(toks).cast("long").as("n_tokens"): _*)
    // last chunk = first window reaching the end: count = 1 for n<=chunk,
    // else 1 + ceil((n - chunk)/step) via the (a + b - 1) div b spelling
    // (doubles are exact here: token counts sit far below 2^52)
    val n = F.col("n_tokens")
    val nChunks = F.when(n <= chunkTokens, F.lit(1L))
      .otherwise(F.floor((n - chunkTokens + (step - 1)) / F.lit(step)) + 1L)
    val start = F.col("chunk_id") * step

    withToks
      .withColumn("chunk_id", F.explode(F.sequence(F.lit(0L), nChunks - 1L)))
      .select(F.col(idCol) +: payloadCols.map(F.col) ++: Seq(
        F.col("chunk_id"),
        n.as("n_tokens"),
        F.least(F.lit(chunkTokens.toLong), n - start).as("chunk_len"),
        F.array_join(
          F.slice(F.col("__toks"), (start + 1L).cast("int"), F.lit(chunkTokens)),
          " ").as("chunk_text")): _*)
  }
}
