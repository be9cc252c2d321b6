package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Duplicated-SPAN removal — the token-window analogue of the
  * exact-substring deduplication used for GPT-3/PaLM-class corpora
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"): instead of dropping whole near-duplicate documents
  * ([[Dedup]]) or whole repeated lines ([[Boilerplate]]), cut the
  * specific k-token windows that appear verbatim in ≥ `minDf` OTHER
  * documents — quotes, chain letters, license blocks, syndicated
  * paragraphs — and keep each document's unique remainder. The
  * published method builds a corpus-wide suffix array; the distributed
  * re-expression is shingle-df over k-token windows, which finds
  * exactly the duplicated substrings of length ≥ k (a duplicated
  * substring of length m ≥ k is a run of m−k+1 duplicated windows, and
  * the union of those windows is the substring).
  *
  * Scale shape (all the heavy keys are 16-byte md5s, never text):
  * the token split is STAGED as its own projection; window hashes are
  * one map-only pass (O(k) string work per token — the same work any
  * engine must do); df is two keyed shuffles (distinct (doc, hash) →
  * count, no Expand); duplicated starts shuffle-join back on the hash
  * (the duplicated set is NOT broadcast — at web scale duplicated
  * content is big); the rebuild collects each doc's start list
  * (bounded by the doc's own token count) and walks tokens ONCE with
  * an O(n) sorted-merge fold — no per-token scan of the start set, no
  * k× position explosion.
  *
  * Whitespace is normalized (trim + single-space rebuild): the unit is
  * the token stream, as in the reference method. Within-doc repetition
  * is deliberately NOT removed here (that's the `text_repetition`
  * quality signal's job); a window must recur across ≥ minDf distinct
  * documents.
  */
object Spans {

  /** Returns one row per input id: (idCol, clean text under `outCol`,
    * `tokens_dropped`). Documents shorter than `k` tokens pass through
    * untouched (no window exists to be duplicated).
    */
  def dropDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int, minDf: Int = 2,
                         outCol: String = "clean_text"): DataFrame = {
    require(k >= 2, s"window k=$k must be >= 2 (k=1 would cut every shared word)")
    require(minDf >= 2, s"minDf $minDf must be >= 2 (1 would cut every window)")
    val id = F.col(idCol)
    // staged split: one split per row, never under a lambda
    val toked = df.select(id,
      F.split(F.trim(F.coalesce(F.col(textCol), F.lit(""))), "\\s+").as("__toks"))
    // window hashes: md5 over the space-joined k-token slice, engine-
    // reproducible; docs with < k tokens produce no windows. The
    // native WindowMd5 is bit-identical to the transform/slice/md5
    // HOF spelling but runs one tight loop per row (HOF lambdas are
    // interpreted per window — the documented hot-path trap)
    val windows = toked
      .filter(F.size(F.col("__toks")) >= k)
      .select(id, F.posexplode(
        graft.functions.native.window_md5(F.col("__toks"), k)).as(Seq("__p", "__h")))
    // cross-document df on the 16-byte key; two keyed shuffles, no Expand
    val dup = windows.select(id, F.col("__h")).distinct()
      .groupBy("__h").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df") >= minDf)
      .select("__h")
    // duplicated window starts per doc (shuffle join on __h — the
    // duplicated set is corpus-sized, never broadcast), collected to a
    // per-doc list bounded by the doc's own token count
    val starts = windows.join(dup, "__h")
      .groupBy(idCol).agg(F.sort_array(F.collect_list(F.col("__p"))).as("__ss"))
    // O(n) sorted-merge walk: starts are distinct sorted positions, so
    // at most one new start opens per token; the native RebuildSpans
    // does the cover walk in one imperative pass (the fold spelling
    // re-copied the kept array per token and interpreted every step)
    val rebuilt = toked.join(starts, Seq(idCol), "left").select(
      id,
      graft.functions.native.rebuild_spans(
        F.col("__toks"),
        F.coalesce(F.col("__ss"), F.array().cast("array<int>")), k).as("__r"))
    rebuilt.select(
      id,
      F.col("__r.kept").as(outCol),
      F.col("__r.dropped").as("tokens_dropped"))
  }

  /** Span-level BENCHMARK DECONTAMINATION — cut from every corpus
    * document each k-token window that appears verbatim anywhere in
    * `bench` (an eval/benchmark corpus), keeping the remainder. This
    * is the token-level decontamination modern pretraining runs apply
    * (the Llama 3 / GPT-4 reports describe exactly this n-gram-overlap
    * removal): [[InvertedIndex.contaminationPairs]] FLAGS contaminated
    * documents for triage; this operator SURGICALLY removes the shared
    * spans so the document's unique remainder still trains.
    *
    * Same window algebra as [[dropDuplicateSpans]] — a shared
    * substring of length m ≥ k is a run of m−k+1 shared windows whose
    * union is the substring — except the duplicate set is the BENCH
    * window set rather than corpus-df ≥ minDf, so a span is cut even
    * when exactly one corpus document carries it (df-based dedup would
    * need the benchmark text to recur; contamination doesn't).
    *
    * Scale shape: the corpus-side pipeline is [[dropDuplicateSpans]]'s
    * (staged split, native window md5, per-doc start lists bounded by
    * the doc's own token count, O(n) native rebuild). The bench window
    * set is eval-suite-sized — MBs, not corpus-sized — so the semi
    * join broadcasts it by default (one map-side pass over the corpus,
    * NO shuffle of the corpus window stream); `broadcastBench = false`
    * routes to a shuffled semi join for giant holdout sets (the tfidf
    * broadcast-fallback discipline). Heavy keys are 16-byte md5s.
    *
    * Returns one row per corpus id: (idCol, `outCol`, tokens_dropped).
    * Corpus docs shorter than k tokens pass through untouched; bench
    * docs shorter than k contribute no windows (nothing to match).
    */
  def decontaminateSpans(corpus: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         k: Int, outCol: String = "clean_text",
                         broadcastBench: Boolean = true): DataFrame = {
    require(k >= 2, s"window k=$k must be >= 2 (k=1 would cut every shared word)")
    val id = F.col(idCol)
    val toked = corpus.select(id,
      F.split(F.trim(F.coalesce(F.col(textCol), F.lit(""))), "\\s+").as("__toks"))
    val windows = toked
      .filter(F.size(F.col("__toks")) >= k)
      .select(id, F.posexplode(
        graft.functions.native.window_md5(F.col("__toks"), k)).as(Seq("__p", "__h")))
    // the bench window SET (distinct 16-byte hashes; bench text never
    // leaves this projection)
    val benchSet0 = bench
      .select(F.split(F.trim(F.coalesce(F.col(textCol), F.lit(""))), "\\s+").as("__bt"))
      .filter(F.size(F.col("__bt")) >= k)
      .select(F.explode(
        graft.functions.native.window_md5(F.col("__bt"), k)).as("__h"))
      .distinct()
    val benchSet = if (broadcastBench) F.broadcast(benchSet0) else benchSet0
    val starts = windows.join(benchSet, Seq("__h"), "left_semi")
      .groupBy(idCol).agg(F.sort_array(F.collect_list(F.col("__p"))).as("__ss"))
    val rebuilt = toked.join(starts, Seq(idCol), "left").select(
      id,
      graft.functions.native.rebuild_spans(
        F.col("__toks"),
        F.coalesce(F.col("__ss"), F.array().cast("array<int>")), k).as("__r"))
    rebuilt.select(
      id,
      F.col("__r.kept").as(outCol),
      F.col("__r.dropped").as("tokens_dropped"))
  }
}
