package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.{native, text}

/** Unigram-LM tokenizer induction — the SentencePiece algorithm
  * (Kudo 2018, "Subword Regularization"), THE production tokenizer
  * beside BPE ([[Bpe]]), distributed the same way:
  *
  *  - The corpus is touched ONCE for the word-frequency dictionary
  *    (staged, as in Bpe — every later job reads the dict, never the
  *    corpus).
  *  - The SEED vocabulary is one distributed aggregate: every
  *    substring of length ≤ `maxPieceLen` of every dict word, weighted
  *    by word frequency × occurrences, top-`seedSize` by (weight desc,
  *    piece asc). SentencePiece proper seeds from a suffix array; the
  *    bounded-length substring stream is the same candidate set for
  *    pieces ≤ maxPieceLen at dict-×-avgLen×maxLen row cost — one
  *    shuffle, map-side combined (stated trade).
  *  - EM rounds are HARD-EM (Viterbi counts — SentencePiece's own
  *    default decode, and exact arithmetic where soft-EM's forward/
  *    backward would float-drift across partition orders): broadcast
  *    the piece table into the codegen'd
  *    [[graft.functions.UnigramSegment]] expression, one map +
  *    keyed-count aggregate over the dict per round, M-step on the
  *    driver (the table is vocab-sized — the only driver state, the
  *    Bpe discipline). Zero-count multi-char pieces drop each round;
  *    after the final round the table PRUNES to `vocabSize` by
  *    (count desc, piece asc), always keeping every seen single char
  *    (coverage: any word segments).
  *  - Probabilities are count/total per round; the returned table
  *    carries ln p (libm ⇒ the vocab face is declared rows-only; the
  *    SEED face is integer-exact and hash-gated, the E15 split).
  *
  * [[tokenCount]]/[[encode]] run the trained table map-only over any
  * stream — the deployment shape, mirroring [[Bpe.tokenCount]].
  */
object Unigram {

  // driver-side tie-breaks must agree with Spark's distributed string
  // sort (UTF8String binary order, not Java UTF-16 — they disagree
  // for supplementary characters; the Bpe reference-spec lesson)
  private implicit val u8Order: Ordering[String] =
    (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))

  /** The staged word-frequency dictionary (one corpus pass). */
  private def wordDict(docs: DataFrame, textCol: String): DataFrame =
    Staging.stage(
      docs.select(F.explode(text.tokens(F.col(textCol))).as("__w"))
        .filter(F.length(F.col("__w")) > 0)
        .groupBy("__w").agg(F.count(F.lit(1)).as("__n")),
      None, "unigram_dict")

  /** Substring-candidate stream over a word column: every (piece,
    * weight) with 1 ≤ len ≤ maxPieceLen, weight = word freq summed
    * over occurrences. Pure relational — the hash-gated half.
    */
  private def substringWeights(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(F.col("__w"), F.col("__n"), F.explode(
        F.sequence(F.lit(1), F.least(F.lit(maxPieceLen), F.length(F.col("__w")))))
        .as("__l"))
      .select(F.col("__n"), F.explode(
        F.transform(
          F.sequence(F.lit(1), F.length(F.col("__w")) - F.col("__l") + 1),
          i => F.col("__w").substr(i, F.col("__l"))))
        .as("piece"))
      .groupBy("piece").agg(F.sum("__n").as("weight"))

  /** The seed table: top `seedSize` substrings by (weight desc, piece
    * asc). Integer weights, deterministic order — the driver face.
    */
  def seedPieces(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                 seedSize: Int = 200): DataFrame =
    substringWeights(wordDict(docs, textCol), maxPieceLen)
      .orderBy(F.col("weight").desc, F.col("piece"))
      .limit(seedSize)

  /** Train the unigram piece table: Seq of (piece, ln p), sorted by
    * (count desc, piece asc) of the final E-step. Deterministic.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            rounds: Int = 4, maxPieceLen: Int = 6,
            seedSize: Int = 2000): Seq[(String, Double)] = {
    require(vocabSize > 0 && rounds > 0 && maxPieceLen > 0 && seedSize > 0,
      s"bad unigram params: vocabSize=$vocabSize rounds=$rounds " +
        s"maxPieceLen=$maxPieceLen seedSize=$seedSize")
    val words = wordDict(docs, textCol)
    // seed: top substrings + every seen single char (coverage floor)
    val seeded = substringWeights(words, maxPieceLen)
      .orderBy(F.col("weight").desc, F.col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles = substringWeights(words, 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var counts: Map[String, Long] =
      (seeded ++ singles).groupBy(_._1).map { case (p, ws) => p -> ws.map(_._2).max }
    var logp: Seq[(String, Double)] = toLogp(counts)
    var round = 0
    while (round < rounds) {
      // E-step: Viterbi counts over the dict, weighted by word freq
      val estep = words
        .select(F.col("__n"),
          F.explode(native.unigram_segment(F.col("__w"), logp)).as("piece"))
        .groupBy("piece").agg(F.sum("__n").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step on the driver: unseen multi-char pieces drop, singles
      // persist at floor count 0 (kept for coverage, scored by +1
      // smoothing below so ln stays finite)
      counts = counts.flatMap { case (p, _) =>
        val c = estep.getOrElse(p, 0L)
        if (c == 0L && p.length > 1) None else Some(p -> c)
      }
      round += 1
      if (round == rounds) {
        // final prune to vocabSize by (count desc, piece asc); every
        // single char survives regardless
        val (keepAlways, candidates) = counts.toSeq.partition(_._1.length == 1)
        val room = math.max(0, vocabSize - keepAlways.size)
        counts = (keepAlways ++
          candidates.sortBy { case (p, c) => (-c, p) }.take(room)).toMap
      }
      logp = toLogp(counts)
    }
    logp
  }

  /** counts → (piece, ln((c+1)/Σ(c+1))), sorted (count desc, piece
    * asc). The +1 keeps coverage singles with zero Viterbi count
    * finitely scored (they must stay usable for foreign words).
    */
  private def toLogp(counts: Map[String, Long]): Seq[(String, Double)] = {
    val total = counts.valuesIterator.map(_ + 1L).sum.toDouble
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, math.log((c + 1L) / total)) }
  }

  /** Per-document unigram token count under a trained table —
    * map-only, the [[Bpe.tokenCount]] shape.
    */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 pieces: Seq[(String, Double)]): DataFrame =
    docs
      .select(F.col(idCol), F.explode(text.tokens(F.col(textCol))).as("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .select(F.col(idCol),
        F.size(native.unigram_segment(F.col("__w"), pieces)).as("__k"))
      .groupBy(idCol).agg(F.sum("__k").as("n_unigram_tokens"))

  /** Segment one word column with the trained table (rank = Viterbi). */
  def encode(word: Column, pieces: Seq[(String, Double)]): Column =
    native.unigram_segment(word, pieces)

  /** SUBWORD REGULARIZATION (Kudo 2018): sample a segmentation from
    * each word's k-best list with P ∝ exp(alpha·logP) — RNG-free via
    * md5(word ‖ salt), so an epoch resamples by changing the salt and
    * results stay partition-order invariant. The augmentation half of
    * the tokenizer: training pipelines feed sampled segmentations,
    * serving uses [[encode]]'s Viterbi.
    */
  def sampleEncode(word: Column, salt: Column, pieces: Seq[(String, Double)],
                   k: Int = 8, alpha: Double = 0.2): Column =
    native.unigram_sample(word, salt, pieces, k, alpha)

  /** Per-document SAMPLED token count — the rows-only driver face:
    * salt = doc id (one draw per word occurrence position would need
    * the position; per-word-type is the paper's `l`-best practice).
    */
  def sampledTokenCount(docs: DataFrame, idCol: String, textCol: String,
                        pieces: Seq[(String, Double)], k: Int = 8,
                        alpha: Double = 0.2, salt: String = "0"): DataFrame =
    docs
      .select(F.col(idCol), F.explode(text.tokens(F.col(textCol))).as("__w"))
      .filter(F.length(F.col("__w")) > 0)
      .select(F.col(idCol),
        F.size(native.unigram_sample(F.col("__w"),
          F.concat(F.col(idCol).cast("string"), F.lit("|"), F.lit(salt)),
          pieces, k, alpha)).as("__k"))
      .groupBy(idCol).agg(F.sum("__k").as("n_sampled_tokens"))
}
