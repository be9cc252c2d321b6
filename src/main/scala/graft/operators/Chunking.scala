package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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

  /** Line-boundary-respecting chunking — the "semantic" sibling of
    * [[chunkByTokens]]: chunks never split a line (paragraph,
    * sentence-per-line, code line…), so retrieval/embedding windows
    * keep natural text units intact. Greedy fold over the document's
    * lines in order:
    *  - a line joins the current chunk unless adding it would push the
    *    chunk past `budgetTokens` AND the chunk is non-empty — then it
    *    starts the next chunk;
    *  - hence every chunk holds ≤ budgetTokens tokens EXCEPT a chunk
    *    whose single line alone exceeds the budget (the anchored-greedy
    *    law: an oversized line sits alone — pack_sequences' S5
    *    contract at line granularity);
    *  - every line lands in exactly one chunk, order preserved, so
    *    joining all chunk_texts with '\n' reconstructs the document;
    *  - blank lines count 0 tokens and flow with their neighborhood.
    *
    * Scale shape: map-only like chunkByTokens — the greedy fold is an
    * in-row `aggregate` over the line array (state O(lines/doc), the
    * row's own content), then an in-row regroup + explode; no shuffle,
    * no cross-row state. All-integer arithmetic, so a SQL oracle
    * replays the fold exactly (recursive CTE, the S5 recipe).
    */
  def chunkByLines(docs: DataFrame, idCol: String, textCol: String,
                   budgetTokens: Int,
                   payloadCols: Seq[String] = Nil): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")

    val lines = F.split(F.col(textCol), "\n")
    def lineWords(l: Column): Column =
      F.when(F.trim(l) === "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(l), "\\s+")))

    // stage the per-line token counts as their own projection (HOF
    // lambdas are interpreted — keep the split out of the fold)
    val staged = docs.select(
      F.col(idCol) +: payloadCols.map(F.col) :+
        lines.as("__lines") :+
        F.transform(lines, lineWords _).as("__ws"): _*)

    // greedy fold: (cid, acc, ids) — ids[i] = chunk of line i
    val zero = F.struct(
      F.lit(0).as("cid"), F.lit(0).as("acc"),
      F.array().cast("array<int>").as("ids"))
    val ids = F.aggregate(
      F.col("__ws"), zero,
      (a: Column, w: Column) => {
        val reset = a.getField("acc") + w > budgetTokens && a.getField("acc") > 0
        val cid = a.getField("cid") + F.when(reset, 1).otherwise(0)
        F.struct(
          cid.as("cid"),
          F.when(reset, w).otherwise(a.getField("acc") + w).as("acc"),
          F.concat(a.getField("ids"), F.array(cid)).as("ids"))
      },
      (a: Column) => a.getField("ids"))

    val withIds = staged.withColumn("__ids", ids)
      .withColumn("chunk_id",
        F.explode(F.sequence(F.lit(0), F.element_at(F.col("__ids"), -1))))
    val cid = F.col("chunk_id")
    val inChunk = F.zip_with(F.col("__ws"), F.col("__ids"),
      (w: Column, c: Column) => F.when(c === cid, w))

    withIds.select(
      F.col(idCol) +: payloadCols.map(F.col) ++: Seq(
        cid.cast("long").as("chunk_id"),
        F.size(F.filter(F.col("__ids"), (c: Column) => c === cid))
          .cast("long").as("chunk_lines"),
        F.aggregate(inChunk, F.lit(0),
          (a: Column, w: Column) => a + F.coalesce(w, F.lit(0)))
          .cast("long").as("chunk_tokens"),
        F.array_join(
          F.zip_with(F.col("__lines"), F.col("__ids"),
            (l: Column, c: Column) => F.when(c === cid, l)),
          "\n").as("chunk_text")): _*)
  }
}
