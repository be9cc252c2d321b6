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
                             buckets: Int, carry: Seq[String] = Seq("__y")): DataFrame =
    Dsir.bucketStream(df, idCol, textCol, buckets, sep = "_", carry = carry)

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
    // the featurization (tokenize → bigram → hash) is epoch-invariant:
    // stage it lazily so epoch 1 computes it ONCE and every later
    // epoch's scoring pass reads the cached buckets instead of
    // re-running the text pipeline (values are unchanged — staging
    // truncates lineage, it does not reorder the integer trajectory)
    val feats = Staging.stageLazy(featureBuckets(labeled, idCol, textCol, buckets))
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

  /** TRAIN a MULTICLASS linear layer — one-vs-rest batch perceptrons,
    * all K classes in ONE corpus pass per epoch (the production
    * trained-lang-id slot: fastText lang-id is exactly this shape —
    * hashed bag-of-ngrams, K linear heads, argmax).
    *
    * Semantics are K independent copies of [[train]]: class k's head
    * sees label y_k = +1 when the doc's label equals `classes(k)` and
    * −1 otherwise, and updates by lr·y_k on every feature bucket of
    * each doc it misclassifies (raw_k·y_k ≤ 0). Training class k alone
    * via the binary [[train]] with those ±1 labels produces the SAME
    * weight table (parity spec-pinned) — but this spelling folds all K
    * heads' scoring into one staged projection and all K gradients
    * into one keyed aggregate keyed by (class, bucket), so each epoch
    * touches the corpus once instead of K times. Integer end-to-end
    * (the E14 determinism contract): the whole K-class trajectory is
    * order-free, partition-invariant, and replayable in SQL with the
    * class axis as DATA (a K-row VALUES table cross-joined in — the
    * oracle does not grow with K).
    *
    * Scale shape: per epoch, one map-only score projection (K in-row
    * folds against K weight-table literals), one generator whose
    * condition lives INSIDE the conditional array (the PushDownPredicates
    * staging rule — see [[train]]), one aggregate bounded by
    * K·(buckets+1) rows collected driver-side (the bounded-artifact
    * lifecycle). Docs whose label is not in `classes` (or NULL) are
    * rejected loudly — a silently-dropped label would train on a
    * subset with no error.
    *
    * Returns (per-class weight tables aligned with `classes`,
    * per-epoch per-class mistake counts).
    */
  def trainOneVsRest(df: DataFrame, idCol: String, textCol: String, labelCol: String,
                     classes: Seq[String], buckets: Int = 4096, epochs: Int = 3,
                     lr: Int = 1): (Seq[Array[Int]], Seq[Seq[Long]]) = {
    require(classes.nonEmpty, "classes must be non-empty")
    require(classes.distinct == classes, s"duplicate class labels in $classes")
    require(buckets > 0, s"buckets=$buckets must be positive")
    require(epochs >= 1, s"epochs=$epochs must be >= 1")
    require(lr > 0, s"lr=$lr must be positive")
    val K = classes.length
    // label -> class index via a when-chain (K is small); an unknown
    // or NULL label maps to the -1 sentinel and must surface loudly
    val kCol = classes.zipWithIndex.reverse.foldLeft(F.lit(-1): Column) {
      case (acc, (c, i)) => F.when(F.col(labelCol) === c, F.lit(i)).otherwise(acc)
    }
    val labeled = df.select(F.col(idCol),
      F.coalesce(F.col(textCol), F.lit("")).as(textCol), kCol.as("__k"))
    // epoch-invariant featurization, staged once (see train)
    val feats = Staging.stageLazy(
      featureBuckets(labeled, idCol, textCol, buckets, carry = Seq("__k")))
    val structT = "array<struct<k:int,b:bigint,y:bigint>>"
    val ws = Array.fill(K)(Array.ofDim[Long](buckets))
    val history = Seq.newBuilder[Seq[Long]]
    for (_ <- 1 to epochs) {
      val lits = ws.map(w => F.typedLit(w.toSeq))
      val rawCols = (0 until K).map { k =>
        F.when(F.size(F.col("__buckets")) === 0, F.lit(0L))
          .otherwise(F.aggregate(F.col("__buckets"), F.lit(0L),
            (acc: Column, b: Column) => acc + F.element_at(lits(k), b.cast("int") + 1)))
          .as(s"__raw$k")
      }
      val scored = feats.select(
        Seq(F.col(idCol), F.col("__k"), F.col("__buckets")) ++ rawCols: _*)
      // per class: a sentinel (k, -1, 1) row counts the mistake, then
      // the doc's buckets each contribute y_k; un-missed classes and
      // bad-label docs yield the empty array (bad labels get ONLY the
      // (-1, -1, 1) diagnostic row — their buckets must never reach
      // the delta sum). The miss test stays INSIDE the conditional
      // array, not a Filter node — see the [[train]] staging note.
      val updates = (0 until K).map { k =>
        val y = F.when(F.col("__k") === k, F.lit(1L)).otherwise(F.lit(-1L))
        F.when(F.col("__k") === -1, F.array().cast(structT))
          .when(F.col(s"__raw$k") * y <= 0L,
            F.concat(
              F.array(F.struct(F.lit(k).as("k"), F.lit(-1L).as("b"), F.lit(1L).as("y"))),
              F.transform(F.col("__buckets"),
                (b: Column) => F.struct(F.lit(k).as("k"), b.as("b"), y.as("y")))))
          .otherwise(F.array().cast(structT))
      }
      val badRow = F.when(F.col("__k") === -1,
          F.array(F.struct(F.lit(-1).as("k"), F.lit(-1L).as("b"), F.lit(1L).as("y"))))
        .otherwise(F.array().cast(structT))
      val deltas = scored
        .select(F.explode(F.concat(updates :+ badRow: _*)).as("__u"))
        .select(F.col("__u.k").as("__uk"), F.col("__u.b").as("__b"), F.col("__u.y").as("__y"))
        .groupBy("__uk", "__b").agg(F.sum("__y").as("__d"))
        .collect()
      val bad = deltas.collect {
        case r if r.getInt(0) == -1 => r.getLong(2)
      }.sum
      require(bad == 0,
        s"labelCol '$labelCol' must be one of $classes; found $bad docs with other labels")
      val mistakes = Array.ofDim[Long](K)
      deltas.foreach { r =>
        val k = r.getInt(0)
        if (k >= 0) {
          val b = r.getLong(1)
          if (b == -1L) mistakes(k) = r.getLong(2)
          else ws(k)(b.toInt) += lr.toLong * r.getLong(2)
        }
      }
      history += mistakes.toSeq
    }
    val out = ws.toSeq.map(_.map { x =>
      require(x >= Int.MinValue && x <= Int.MaxValue, s"weight overflow: $x")
      x.toInt
    })
    (out, history.result())
  }

  /** Multiclass INFERENCE: (idCol, n_features, pred, best_raw) —
    * argmax over the K heads' integer raw vote sums, ties broken by
    * LOWEST class index (so a zero-feature doc, all-zero scores,
    * deterministically predicts `classes.head`). One map-only
    * projection: tokens staged once, then K codegen'd
    * [[graft.functions.native.HashedVoteSum]] folds (weights ride as
    * reference objects — the broadcast-model shape) and an in-row
    * array_max over (raw, −k) structs. Integer end-to-end ⇒
    * bit-identical across engines and partitionings — the full
    * train-then-predict pipeline replays under a SQL hash oracle.
    */
  def predictClasses(df: DataFrame, idCol: String, textCol: String,
                     classes: Seq[String], weights: Seq[Array[Int]],
                     buckets: Int = 4096): DataFrame = {
    require(weights.length == classes.length,
      s"${weights.length} weight tables for ${classes.length} classes")
    weights.foreach(w => require(w.length == buckets,
      s"model arity mismatch: ${w.length} weights for $buckets buckets"))
    val K = classes.length
    val voteCols = (0 until K).map { k =>
      graft.functions.native.hashed_vote_sum(F.col("__toks"), weights(k).toSeq).as(s"__v$k")
    }
    // max of (raw, -k) structs = max raw, ties -> smallest k
    val packed = F.array((0 until K).map { k =>
      F.struct(F.col(s"__v$k.raw").as("raw"), F.lit(-k).as("negk"))
    }: _*)
    val predCol = classes.zipWithIndex.reverse.foldLeft(F.lit(classes.head): Column) {
      case (acc, (c, i)) => F.when(-F.col("__best.negk") === i, F.lit(c)).otherwise(acc)
    }
    df.select(F.col(idCol), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col(idCol) +: voteCols: _*)
      .select(F.col(idCol), F.col("__v0.n_features").as("n_features"),
        F.array_max(packed).as("__best"))
      .select(F.col(idCol), F.col("n_features"), predCol.as("pred"),
        F.col("__best.raw").as("best_raw"))
  }

  /** Multiclass inference with FULL input passthrough — the BigQuery
    * ML.PREDICT shape (every input column survives, prediction columns
    * append): `predicted_label` (argmax class, ties to the lowest
    * class index), `predicted_label_raw` (the winning head's integer
    * vote sum — the deterministic face), and `predicted_probs`
    * (per-class sigmoid of the mean-pooled score — the calibrated-ish
    * probability BigQuery surfaces; libm exp ⇒ spec-gated, never
    * hashed). Same one-projection shape as [[predictClasses]].
    */
  def withPrediction(df: DataFrame, textCol: String,
                     classes: Seq[String], weights: Seq[Array[Int]],
                     buckets: Int = 4096): DataFrame = {
    require(weights.length == classes.length,
      s"${weights.length} weight tables for ${classes.length} classes")
    Seq("predicted_label", "predicted_label_raw", "predicted_probs").foreach { c =>
      require(!df.columns.map(_.toLowerCase).contains(c),
        s"ML.PREDICT input already carries a '$c' column — rename it")
    }
    val K = classes.length
    val voteCols = (0 until K).map { k =>
      graft.functions.native.hashed_vote_sum(F.col("__toks"), weights(k).toSeq).as(s"__v$k")
    }
    val packed = F.array((0 until K).map { k =>
      F.struct(F.col(s"__v$k.raw").as("raw"), F.lit(-k).as("negk"))
    }: _*)
    val predCol = classes.zipWithIndex.reverse.foldLeft(F.lit(classes.head): Column) {
      case (acc, (c, i)) => F.when(-F.col("__best.negk") === i, F.lit(c)).otherwise(acc)
    }
    val nF = F.col("__v0.n_features")
    val probs = F.array((0 until K).map { k =>
      val s = F.col(s"__v$k.raw").cast("double") /
        (F.greatest(nF, F.lit(1L)).cast("double") * 1000.0)
      F.struct(F.lit(classes(k)).as("label"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))).as("prob"))
    }: _*)
    val passthrough = df.columns.toSeq.map(F.col)
    df.select(passthrough :+ text.tokens(F.col(textCol)).as("__toks"): _*)
      .select(passthrough ++ voteCols: _*)
      .select(passthrough ++ Seq(F.array_max(packed).as("__best"),
        probs.as("predicted_probs")): _*)
      .select(passthrough ++ Seq(predCol.as("predicted_label"),
        F.col("__best.raw").cast("long").as("predicted_label_raw"),
        F.col("predicted_probs")): _*)
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
