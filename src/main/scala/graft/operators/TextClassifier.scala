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

  /** Per-document hashed-feature bucket stream under the SAME law as
    * [[score]] (unigrams + '_'-joined adjacent bigrams, 52-bit
    * md5-prefix % buckets — the hash is part of the model, so trainer
    * and scorer must share it exactly). One shared implementation with
    * DSIR's feature stream ([[Dsir.bucketStream]], the §4-staged
    * spelling) — only the bigram separator differs between the two
    * hash laws.
    */
  private def featureBuckets(df: DataFrame, idCol: String, textCol: String,
                             buckets: Int): DataFrame =
    Dsir.bucketStream(df, idCol, textCol, buckets, sep = "_", carry = Seq("__y"))

  /** TRAIN the linear layer — full-batch perceptron (Rosenblatt's rule
    * in its batch form; the Collins 2002 structured-perceptron recipe
    * reduced to binary): for `epochs` rounds, score every doc under
    * the current weights, and for each MISCLASSIFIED doc (raw·y ≤ 0,
    * y ∈ {−1,+1}) add lr·y to every feature bucket it carries.
    *
    * Why perceptron and not logistic SGD: the update is INTEGER
    * arithmetic end-to-end — no sigmoid, no learning-rate decay, no
    * float gradient — so the whole training trajectory is order-free
    * and bit-reproducible across partitionings AND engines (the E14
    * determinism contract extended from inference to training; a SQL
    * oracle can replay every epoch as chained CTEs). A trained
    * logistic model quantizes into the same integer centi-unit scorer
    * this produces directly.
    *
    * Scale shape: each epoch is ONE corpus pass — the per-doc raw
    * score is an in-row fold against the weight table riding the plan
    * as a literal (map-only, the [[score]]/[[Dsir.score]] shape), the
    * gradient is one keyed aggregate over the misclassified docs'
    * exploded buckets whose output is bounded by `buckets` (map-side
    * partials), and the driver folds the bounded delta into the model
    * (the centroids/codebooks bounded-artifact lifecycle — this is the
    * distributed-fastText epoch loop). Docs whose label column is not
    * ±1 are rejected loudly.
    *
    * Returns (weights, mistakes-per-epoch). Weights plug straight into
    * [[score]]; mistake counts are the convergence signal (0 =
    * linearly separable and solved).
    */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            buckets: Int = 4096, epochs: Int = 3, lr: Int = 1): (Array[Int], Seq[Long]) = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    require(epochs >= 1, s"epochs=$epochs must be >= 1")
    require(lr > 0, s"lr=$lr must be positive")
    // NULL text tokenizes like empty text; a NULL label must surface
    // in the __bad count below (a silently-dropped doc would train a
    // subset with no error), so it maps to a sentinel no valid label
    // can collide with
    val labeled = df.select(F.col(idCol),
      F.coalesce(F.col(textCol), F.lit("")).as(textCol),
      F.coalesce(F.col(labelCol).cast("long"), F.lit(Long.MinValue)).as("__y"))
    val feats = featureBuckets(labeled, idCol, textCol, buckets)
    val w = Array.ofDim[Long](buckets)
    val history = Seq.newBuilder[Long]
    for (_ <- 1 to epochs) {
      val lit = F.typedLit(w.toSeq)
      val scored = feats.select(F.col(idCol), F.col("__y"), F.col("__buckets"),
        F.when(F.size(F.col("__buckets")) === 0, F.lit(0L))
          .otherwise(F.aggregate(F.col("__buckets"), F.lit(0L),
            (acc: Column, b: Column) => acc + F.element_at(lit, b.cast("int") + 1)))
          .as("__raw"))
      // the missed-doc condition lives INSIDE the generator (explode
      // of a conditional array; an un-missed doc yields the empty
      // array and vanishes), NOT in a Filter node: PushDownPredicates
      // would push a filter below the staged projections and inline
      // the whole tokenize→bigram→hash→fold pipeline into the
      // predicate — where the bigram lambda re-runs split() per
      // element (observed 26 s/epoch; reference-count staging blocks
      // CollapseProject but not predicate pushdown — see §4). Label
      // contract checked on the same pass (a non-±1 label routes its
      // doc into the aggregate's __bad count and fails the require).
      // ordered branches: the bad-label test fires FIRST, emitting
      // ONLY the sentinel (its buckets must not reach the delta sum
      // with a sentinel label, and raw * MinValue would overflow under
      // ANSI before the require could diagnose it)
      val missedBuckets = F
        .when(F.col("__y") =!= 1L && F.col("__y") =!= -1L, F.array(F.lit(-1L)))
        .when(F.col("__raw") * F.col("__y") <= 0L,
          F.concat(F.array(F.lit(-1L)), F.col("__buckets")))
        .otherwise(F.array().cast("array<long>"))
      // one aggregate for gradient AND mistake count: each missed doc
      // explodes to a sentinel −1 row (counts the mistake) plus its
      // bucket occurrences (each contributes y); output ≤ buckets+1 rows
      val deltas = scored
        .select(F.col("__y"), F.explode(missedBuckets).as("__b"))
        .groupBy("__b")
        .agg(F.sum(F.when(F.col("__b") === -1L, F.lit(1L))
          .otherwise(F.col("__y"))).as("__d"),
          F.count(F.when(F.col("__y") =!= 1L && F.col("__y") =!= -1L, 1)).as("__bad"))
        .collect()
      val bad = deltas.map(_.getLong(2)).sum
      require(bad == 0, s"labelCol '$labelCol' must be exactly +1/-1; found $bad other-valued feature rows")
      var mistakes = 0L
      deltas.foreach { r =>
        val b = r.getLong(0)
        if (b == -1L) mistakes = r.getLong(1)
        else w(b.toInt) += lr.toLong * r.getLong(1)
      }
      history += mistakes
    }
    val out = w.map { x =>
      require(x >= Int.MinValue && x <= Int.MaxValue, s"weight overflow: $x")
      x.toInt
    }
    (out, history.result())
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
