package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.text

/** Linear text-classifier INFERENCE at corpus scale — the fastText
  * shape (Joulin et al. 2016: hashed bag-of-ngrams → linear layer)
  * that LLM-data pipelines run as the learned quality/domain filter
  * next to E1's heuristic score (the CCNet/LLaMA "quality classifier"
  * slot).
  *
  * Features are unigrams + adjacent-bigrams hashed into `buckets`
  * slots (the hashing trick — no vocabulary table ships with the
  * model); the model is ONE int array riding the plan as a literal
  * (the SQL-native spelling of a broadcast weight vector), and the
  * whole scorer is a single map-only projection: tokens → features →
  * bucket lookup → integer vote sum. NO shuffle, NO UDF — at 100 TB
  * this runs at scan speed beside the other per-doc signals.
  *
  * Determinism contract (what makes the driver oracle possible):
  * weights are INTEGER centi-units and the fold is an integer sum —
  * a float dot product would hash differently across engines because
  * double addition is order-sensitive; the integer sum is exact in
  * any order, and the final normalization is one exactly-rounded IEEE
  * division. Scores are therefore bit-identical across engines AND
  * across partitionings. `score = Σ w[h(f)] / (1000·|features|)` —
  * mean-pooled, in the weights' natural unit.
  *
  * The sigmoid a trained classifier would apply is monotone, so
  * thresholding on this raw score IS thresholding on the probability;
  * callers needing calibrated probabilities apply `sigmoid` at the
  * edge (libm — same rows-only caveat as text_surprisal).
  */
object TextClassifier {

  /** A deterministic demo model: w[b] = ((b · 2654435761) mod 1001) −
    * 500 ∈ [−500, 500] centi-units (Knuth's multiplicative constant
    * scrambles bucket order). Stands in for trained weights in specs
    * and the driver query; real models load their int-quantized array
    * from wherever training left it.
    */
  def hashedWeights(buckets: Int): Array[Int] = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    Array.tabulate(buckets)(b => ((b.toLong * 2654435761L) % 1001L).toInt - 500)
  }

  /** Score every document: (idCol, n_features, score). One map-only
    * projection (verify with `.explain` — no Exchange); the
    * unigram+bigram hash/lookup/vote fold runs as ONE codegen'd
    * native expression per row ([[graft.functions.native.HashedVoteSum]]
    * — the 52-bit md5 `Sampling.hash52` family, weights riding as a
    * reference object: the broadcast-model shape). The hash is part
    * of the MODEL (weights are trained against a fixed hashing), so
    * there is no production/pinned split here.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Int], buckets: Int = 4096): DataFrame = {
    require(weights.length == buckets,
      s"model arity mismatch: ${weights.length} weights for $buckets buckets")
    // tokens staged as their own codegen'd projection (the HOF rule),
    // then the native fold consumes the slot
    df.select(F.col(idCol), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col(idCol),
        graft.functions.native.hashed_vote_sum(F.col("__toks"), weights.toSeq).as("__v"))
      .select(F.col(idCol), F.col("__v.n_features").as("n_features"),
        (F.col("__v.raw").cast("double") /
          (F.col("__v.n_features").cast("double") * 1000.0)).as("score"))
  }
}
