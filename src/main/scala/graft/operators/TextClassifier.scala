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

  /** 52-bit md5 feature hash → bucket. The hash is part of the MODEL
    * (weights are trained against a fixed hashing), so there is no
    * production/pinned split here — md5's cost is paid once per
    * feature inside the same projection.
    */
  private def bucket(feature: Column, buckets: Int): Column =
    F.pmod(Sampling.hash52(feature), F.lit(buckets.toLong))

  /** Score every document: (idCol, n_features, score). One map-only
    * projection (verify with `.explain` — no Exchange), weights as a
    * plan literal.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Int], buckets: Int = 4096): DataFrame = {
    require(weights.length == buckets,
      s"model arity mismatch: ${weights.length} weights for $buckets buckets")
    val w = F.typedlit(weights)
    // staged per the HOF rule: split() runs as its own codegen'd
    // projection; only slot dereferences live under the lambdas
    val toks = df.select(F.col(idCol), text.tokens(F.col(textCol)).as("__toks"))
    val bigramLen = F.greatest(F.size(F.col("__toks")) - 1, F.lit(0))
    val feats = toks.select(F.col(idCol),
      F.concat(F.col("__toks"),
        F.zip_with(
          F.slice(F.col("__toks"), F.lit(1), bigramLen),
          F.slice(F.col("__toks"), F.lit(2), bigramLen),
          (a, b) => F.concat(a, F.lit("_"), b))).as("__feats"))
    feats.select(F.col(idCol),
        F.size(F.col("__feats")).cast("long").as("n_features"),
        F.aggregate(F.col("__feats"), F.lit(0L),
          (acc, f) => acc + F.element_at(w, (bucket(f, buckets) + 1).cast("int")).cast("long"))
          .as("__raw"))
      .select(F.col(idCol), F.col("n_features"),
        (F.col("__raw").cast("double") /
          (F.col("n_features").cast("double") * 1000.0)).as("score"))
  }
}
