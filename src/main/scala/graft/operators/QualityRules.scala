package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.{text => T}

/** The two canonical published web-corpus filter rule sets, as
  * map-only report operators: the Gopher quality rules (Rae et al.
  * 2021, "Scaling Language Models: ... Gopher", Appendix A1.1) and
  * the C4 line/page filters (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning...", §2.2). Every serious LLM data
  * pipeline runs one or both before the statistical signals (E1
  * quality score, E10/E15 LM surprisal, E14 learned classifier);
  * these are the deterministic rule-based gates that remove the
  * obviously-broken pages first.
  *
  * Both operators emit one row per document with every rule's
  * MEASURE and pass FLAG (plus the conjunction), not just a filtered
  * corpus — the report shape is what a pipeline needs to tune
  * thresholds and audit what a gate dropped (the A26 Constraints
  * philosophy). Filtering is `.where(col("pass"))` on top.
  *
  * Scale shape: both are ONE map-only projection — token/line
  * statistics are in-row array folds over the split text, thresholds
  * are plan literals; no shuffle, no UDF, no state. 100 TB filters at
  * scan speed, and the rules compose with any downstream plan.
  *
  * Everything is integer counts and exactly-rounded IEEE divisions
  * of integers (the corpus_mix discipline), so a SQL oracle replays
  * every measure and flag bit-for-bit.
  */
object QualityRules {

  /** Gopher rule thresholds (defaults = the published Appendix A1.1
    * values). `stopwords` is the "must contain ≥ minStopwords
    * distinct members" list — Gopher's is (the, be, to, of, and,
    * that, have, with); callers tune it per corpus.
    */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))

  /** Per-document Gopher rule report: measures
    * (n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    * ellipsis_line_frac, alpha_word_frac, n_stop_distinct), one
    * boolean per rule, and `pass` = all rules hold.
    *
    * Rule semantics (each a published Gopher filter):
    *  - word count within [minWords, maxWords];
    *  - mean word length within [minMeanWordLen, maxMeanWordLen];
    *  - symbol-to-word ratio ('#' chars + '...' occurrences, counted
    *    by replace-shrinkage so an oracle replays it) ≤ max;
    *  - fraction of lines starting (after left-trim) with a bullet
    *    ('•', '-', '*') ≤ max;
    *  - fraction of lines ending (after right-trim) with '...' or
    *    '…' ≤ max;
    *  - fraction of words containing ≥1 ASCII letter ≥ min
    *    (tokens are lowercased, so [a-z] covers the alphabet);
    *  - ≥ minStopwords DISTINCT members of `stopwords` present.
    *
    * Tokenization is the corpus-wide E3 trim+lower+whitespace-split
    * convention; lines split on '\n' of the RAW text. A blank
    * document tokenizes to one empty token (n_words=1, zero-length),
    * matching every other operator in the engine.
    */
  def gopher(docs: DataFrame, idCol: String, textCol: String,
             t: GopherThresholds = GopherThresholds()): DataFrame =
    docs.select(F.col(idCol) +:
      gopherCols(F.col(textCol), t).map { case (n, c) => c.as(n) }: _*)

  /** The gate face: ONE boolean column — the conjunction of every
    * Gopher rule — for inline use in a filter (the CorpusPipeline
    * stage-1 hook). Bit-identical to the report's `pass` column by
    * construction (same column tree).
    */
  def gopherPass(c: Column, t: GopherThresholds = GopherThresholds()): Column =
    gopherCols(c, t).last match { case ("pass", col) => col }

  private def gopherCols(txt: Column, t: GopherThresholds): Seq[(String, Column)] = {
    val toks = T.tokens(txt)
    val lines = F.split(txt, "\n")

    val nWords = F.size(toks).cast("long")
    val wordChars = F.aggregate(toks, F.lit(0L),
      (acc: Column, tk: Column) => acc + F.length(tk).cast("long"))
    val meanWordLen = wordChars.cast("double") / nWords.cast("double")

    val hashCnt =
      (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))).cast("long")
    val ellipsisCnt =
      ((F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3).cast("long")
    val symbolRatio = (hashCnt + ellipsisCnt).cast("double") / nWords.cast("double")

    val nLines = F.size(lines).cast("long")
    val bulletLines = F.size(F.filter(lines, (l: Column) => {
      val lt = F.ltrim(l)
      lt.startsWith("•") || lt.startsWith("-") || lt.startsWith("*")
    })).cast("long")
    val ellipsisLines = F.size(F.filter(lines, (l: Column) => {
      val rt = F.rtrim(l)
      rt.endsWith("...") || rt.endsWith("…")
    })).cast("long")
    val bulletFrac = bulletLines.cast("double") / nLines.cast("double")
    val ellipsisFrac = ellipsisLines.cast("double") / nLines.cast("double")

    val alphaWords =
      F.size(F.filter(toks, (tk: Column) => tk.rlike("[a-z]"))).cast("long")
    val alphaFrac = alphaWords.cast("double") / nWords.cast("double")

    val stopDistinct = F.size(F.array_intersect(
      F.array_distinct(toks),
      F.array(t.stopwords.map(F.lit): _*))).cast("long")

    val passWords = nWords >= t.minWords && nWords <= t.maxWords
    val passMeanLen =
      meanWordLen >= t.minMeanWordLen && meanWordLen <= t.maxMeanWordLen
    val passSymbol = symbolRatio <= t.maxSymbolWordRatio
    val passBullet = bulletFrac <= t.maxBulletLineFrac
    val passEllipsis = ellipsisFrac <= t.maxEllipsisLineFrac
    val passAlpha = alphaFrac >= t.minAlphaWordFrac
    val passStop = stopDistinct >= t.minStopwords

    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanWordLen,
      "symbol_word_ratio" -> symbolRatio,
      "bullet_line_frac" -> bulletFrac,
      "ellipsis_line_frac" -> ellipsisFrac,
      "alpha_word_frac" -> alphaFrac,
      "n_stop_distinct" -> stopDistinct,
      "pass_words" -> passWords,
      "pass_mean_word_len" -> passMeanLen,
      "pass_symbol_ratio" -> passSymbol,
      "pass_bullet_lines" -> passBullet,
      "pass_ellipsis_lines" -> passEllipsis,
      "pass_alpha_words" -> passAlpha,
      "pass_stopwords" -> passStop,
      "pass" -> (passWords && passMeanLen && passSymbol && passBullet &&
        passEllipsis && passAlpha && passStop))
  }

  /** Gopher repetition-rule thresholds (defaults = the published
    * Appendix A1.1 repetition table values).
    */
  final case class RepetitionThresholds(
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxTop2GramCharFrac: Double = 0.20,
      maxTop3GramCharFrac: Double = 0.18)

  /** The OTHER half of the Gopher rule set — the repetition filters
    * (Rae et al. 2021, Appendix A1.1 repetition table), complementing
    * [[gopher]]'s quality rules. Within-document repetition is the
    * signature of templated/spammy/looping pages, and these rules are
    * the published cut-offs:
    *  - duplicate-LINE fraction: (n_lines − n_distinct_lines)/n_lines
    *    — the share of line occurrences beyond each line's first;
    *  - duplicate-line CHARACTER fraction: the same mass weighted by
    *    line length (total line chars − distinct-line chars)/total;
    *  - top n-gram character fraction (n = 2, 3): occurrences of the
    *    most frequent token n-gram × its character length (tokens
    *    joined with one space), over the document's character length —
    *    ties on count resolve to the lexicographically smallest gram
    *    (both sides scan grams in sorted order, so the tie rule is
    *    "first in sort order", engine-independent for ASCII tokens).
    * (Gopher also cuts on duplicate PARAGRAPHS; with the corpus-wide
    * one-line-per-unit rendering, paragraphs ≡ lines here — callers
    * with blank-line-separated paragraphs re-split and reuse the same
    * line rules. The longer top-gram tails (n = 4..10) follow the
    * identical shape; the E6 repetition signal and C12 span dedup
    * cover the duplicated-window family corpus-wide.)
    *
    * Map-only like [[gopher]]: line stats are in-row array folds, the
    * top-gram search is an in-row fold over the SORTED gram array
    * (run-length of equal neighbors — no per-doc hash map, no
    * shuffle). Integer counts + exact IEEE divisions ⇒ a SQL oracle
    * replays every measure and flag.
    */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
                       t: RepetitionThresholds = RepetitionThresholds()): DataFrame = {
    val txt = F.col(textCol)
    val toks = T.tokens(txt)
    val lines = F.split(txt, "\n")

    val nLines = F.size(lines).cast("long")
    val nDistinct = F.size(F.array_distinct(lines)).cast("long")
    val dupLineFrac = (nLines - nDistinct).cast("double") / nLines.cast("double")

    def charSum(arr: Column): Column = F.aggregate(arr, F.lit(0L),
      (acc: Column, l: Column) => acc + F.length(l).cast("long"))
    val totalLineChars = charSum(lines)
    val distinctLineChars = charSum(F.array_distinct(lines))
    val dupLineCharFrac = F.when(totalLineChars === 0, F.lit(0.0))
      .otherwise((totalLineChars - distinctLineChars).cast("double") /
        totalLineChars.cast("double"))

    // most-frequent token n-gram via a run-length fold over the sorted
    // gram array: (prev, run, best_run, best_gram); a later gram only
    // replaces on a STRICTLY longer run, so equal counts keep the
    // lexicographically smallest (first-in-sort-order) gram
    def topGramFrac(n: Int): Column = {
      val grams = F.when(F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
          (i: Column) => F.concat_ws(" ",
            (0 until n).map(o => F.element_at(toks, i + o)): _*)))
        .otherwise(F.array().cast("array<string>"))
      val zero = F.struct(F.lit("").as("prev"), F.lit(0L).as("run"),
        F.lit(0L).as("best_run"), F.lit("").as("best_gram"))
      val best = F.aggregate(F.array_sort(grams), zero,
        (a: Column, g: Column) => {
          val run = F.when(g === a.getField("prev"), a.getField("run") + 1L).otherwise(F.lit(1L))
          val better = run > a.getField("best_run")
          F.struct(g.as("prev"), run.as("run"),
            F.when(better, run).otherwise(a.getField("best_run")).as("best_run"),
            F.when(better, g).otherwise(a.getField("best_gram")).as("best_gram"))
        })
      F.when(F.length(txt) === 0 || best.getField("best_run") === 0, F.lit(0.0))
        .otherwise(
          (best.getField("best_run") * F.length(best.getField("best_gram")).cast("long"))
            .cast("double") / F.length(txt).cast("double"))
    }
    val top2 = topGramFrac(2)
    val top3 = topGramFrac(3)

    val passDupLines = dupLineFrac <= t.maxDupLineFrac
    val passDupChars = dupLineCharFrac <= t.maxDupLineCharFrac
    val passTop2 = top2 <= t.maxTop2GramCharFrac
    val passTop3 = top3 <= t.maxTop3GramCharFrac

    docs.select(
      F.col(idCol),
      dupLineFrac.as("dup_line_frac"),
      dupLineCharFrac.as("dup_line_char_frac"),
      top2.as("top2gram_char_frac"),
      top3.as("top3gram_char_frac"),
      passDupLines.as("pass_dup_lines"),
      passDupChars.as("pass_dup_line_chars"),
      passTop2.as("pass_top2gram"),
      passTop3.as("pass_top3gram"),
      (passDupLines && passDupChars && passTop2 && passTop3).as("pass"))
  }

  /** C4 line/page filters (Raffel et al. 2020 §2.2), as a
    * per-document report with the cleaned text:
    *  - a LINE survives iff, after trimming, it ends in a terminal
    *    punctuation mark ('.', '!', '?', or a closing double quote),
    *    has ≥ minLineWords words, and does not contain the word
    *    "javascript" (case-insensitive) — the published
    *    boilerplate/code-chrome line rules;
    *  - the PAGE survives iff its raw text contains neither
    *    "lorem ipsum" (case-insensitive) nor a curly brace '{', and
    *    ≥ minKeptLines lines survived.
    * (C4 also applies a bad-word blocklist; that is a policy list,
    * not an algorithm — callers compose it as one more
    * `lower(text) NOT LIKE` conjunct or an A24 Bloom droplist.)
    *
    * Output: id, clean_text (surviving lines joined with '\n'; empty
    * string when none survive), n_lines, n_kept_lines, has_lorem,
    * has_brace, and keep = the page rule. Word counting treats an
    * all-whitespace line as 0 words (CASE-guarded identically in the
    * oracle). Map-only: one projection, in-row list filter + join.
    */
  def c4Filters(docs: DataFrame, idCol: String, textCol: String,
                minLineWords: Int = 3, minKeptLines: Int = 3): DataFrame = {
    val txt = F.col(textCol)
    val lines = F.split(txt, "\n")

    def lineWords(l: Column): Column =
      F.when(F.trim(l) === "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(l), "\\s+")))

    def keptLine(l: Column): Column = {
      val rt = F.rtrim(l)
      val terminal = rt.endsWith(".") || rt.endsWith("!") ||
        rt.endsWith("?") || rt.endsWith("\"")
      terminal && lineWords(l) >= minLineWords &&
        !F.lower(l).contains("javascript")
    }

    val kept = F.filter(lines, keptLine _)
    val nLines = F.size(lines).cast("long")
    val nKept = F.size(kept).cast("long")
    val hasLorem = F.lower(txt).contains("lorem ipsum")
    val hasBrace = txt.contains("{")
    val keep = !hasLorem && !hasBrace && nKept >= minKeptLines

    docs.select(
      F.col(idCol),
      F.array_join(kept, "\n").as("clean_text"),
      nLines.as("n_lines"),
      nKept.as("n_kept_lines"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      keep.as("keep"))
  }
}
