package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.{native, text}

/** Deduplication family for LLM training-data pipelines (SURVEY.md §2
  * C-block). Everything is shuffle-bounded: candidate generation is
  * always a bucketed equi-join (LSH band, simhash band, or IVF-cell
  * block) — never an O(n²) cross join — so each stage is a single
  * keyed shuffle that scales linearly with corpus size.
  *
  * Performance note: Spark evaluates higher-order-function lambdas
  * interpreted, re-evaluating any non-attribute subtree per element.
  * Each derivation (tokens → shingles → signature → bands) is
  * therefore staged as its own projection so lambda bodies only
  * dereference row slots — collapsing these stages into one expression
  * turns an O(k·n) signature into an O(k·n²·|text|) one.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id.
    * One shuffle on a 128-bit hash — at 100 TB this is the cheapest
    * possible exact pass (hash is computed map-side, rows collapse in
    * the partial aggregation before the exchange).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(F.md5(F.col(textCol)).as("h"))
      .agg(F.min(F.col(idCol)).as("keep_id"), F.count(F.lit(1)).as("n_dups"))

  /** LSH band hashes from a materialized signature column. */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    F.transform(
      F.sequence(F.lit(0), F.lit(bands - 1)),
      b => F.xxhash64(F.slice(sig, b * rows + 1, F.lit(rows))))

  /** (id, sh, sig) per document — tokens, shingles, and signature each
    * staged as their own projection (see perf note above).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 64, shingleN: Int = 3): DataFrame =
    df.select(F.col(idCol).as("id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("id"), native.word_shingles(F.col("__toks"), shingleN).as("sh"))
      .select(F.col("id"), F.col("sh"), native.minhash_signature(F.col("sh"), k).as("sig"))

  /** Candidate pairs (idA < idB) sharing at least one LSH bucket.
    * posexplode + self-equi-join on (band, bucket): one shuffle per
    * side; AQE splits hot buckets.
    */
  def candidatesFromSignatures(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val banded = sigs.select(
      F.col("id"), F.posexplode(bandHashes(F.col("sig"), bands, rows)).as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with estimated Jaccard (fraction of equal
    * signature slots) ≥ `threshold`. The signature table is recomputed
    * by the verify join rather than cached — native signatures are
    * cheap, and a library-held cache() leaks storage blocks for the
    * session lifetime (callers owning a long-lived session can cache
    * `signatures(...)` themselves).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0,
      s"k=$k must be a multiple of bands=$bands (trailing signature slots would be silently unbanded)")
    val sigs = signatures(df, idCol, textCol, k).select("id", "sig")
    minhashPairsFromSignatures(sigs, bands, k / bands, threshold)
  }

  /** [[minhashPairs]] from an already-computed `(id, sig)` table —
    * callers that hold staged signatures (e.g. [[DedupIndex.ingest]])
    * skip the re-sketch pass; values are identical because a doc's
    * signature is a pure function of its text.
    */
  def minhashPairsFromSignatures(sigs: DataFrame, bands: Int, rows: Int,
                                 threshold: Double): DataFrame = {
    val sigA = sigs.select(F.col("id").as("id_a"), F.col("sig").as("sig_a"))
    val sigB = sigs.select(F.col("id").as("id_b"), F.col("sig").as("sig_b"))
    candidatesFromSignatures(sigs, bands, rows)
      .join(sigA, "id_a").join(sigB, "id_b")
      .select(F.col("id_a"), F.col("id_b"),
        native.sig_match_fraction(F.col("sig_a"), F.col("sig_b")).as("est_jaccard"))
      .filter(F.col("est_jaccard") >= threshold)
  }

  /** Cross-engine-replayable MinHash-LSH: identical pipeline shape to
    * [[minhashPairs]] (staged signature → banding → bucket equi-join →
    * estimate filter), but every hash is md5 over an explicit
    * seed-prefixed string, so signature slots are lexicographic minima
    * of hex digests and band buckets are md5 of the joined slice —
    * all of it plain SQL any engine computes bit-identically. This is
    * the hash-oracle face of the C2 surface: the production routing
    * stays [[minhashPairs]] (xxhash64 signatures are one codegen'd
    * long op per slot vs an md5 + hex round-trip here), but the LSH
    * *logic* — banding arithmetic, candidate-pair join, match-fraction
    * estimate — is shared shape and gets a full DuckDB replay through
    * this face. Same min-wise estimator (Broder 1997), same one
    * shuffle per stage; ~8× more bytes/slot than the long path.
    */
  def minhashPairsPinned(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 12, bands: Int = 4, threshold: Double = 0.5,
                         shingleN: Int = 3): DataFrame = {
    require(k % bands == 0,
      s"k=$k must be a multiple of bands=$bands (trailing signature slots would be silently unbanded)")
    val rows = k / bands
    // staged like signatures(): tokens → shingles → signature, so the
    // HOF lambdas only dereference row slots (see perf note above)
    val sh = df.select(F.col(idCol).as("id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("id"), native.word_shingles(F.col("__toks"), shingleN).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
    // signature via explode + k codegen'd md5 columns + k MIN
    // aggregates (map-side partials): bit-identical to the
    // array_min-of-transform spelling (lexicographic hex minima either
    // way) but the md5s run compiled instead of inside interpreted HOF
    // lambdas — 4× on the bench face; the one keyed exchange moves
    // only (id, k minima) after partial aggregation
    val sigCols = (0 until k).map(i =>
      F.min(F.md5(F.concat(F.lit(s"$i:"), F.col("__s")))).as(s"__m$i"))
    val sigs = sh.select(F.col("id"), F.explode(F.col("sh")).as("__s"))
      .groupBy("id").agg(sigCols.head, sigCols.tail: _*)
      .select(F.col("id"), F.array((0 until k).map(i => F.col(s"__m$i")): _*).as("sig"))
    val banded = sigs.select(F.col("id"),
      F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
        b => F.md5(F.concat_ws("|", F.slice(F.col("sig"), b * rows + 1, F.lit(rows))))))
        .as(Seq("band", "bucket")))
    val cands = banded.as("a")
      .join(banded.as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .distinct()
    val sigA = sigs.select(F.col("id").as("id_a"), F.col("sig").as("sig_a"))
    val sigB = sigs.select(F.col("id").as("id_b"), F.col("sig").as("sig_b"))
    cands.join(sigA, "id_a").join(sigB, "id_b")
      .select(F.col("id_a"), F.col("id_b"),
        (F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"),
          (x, y) => x === y), m => m)).cast("double") / k).as("est_jaccard"))
      .filter(F.col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard over ALL pairs — no banding, no estimate:
    * the calibration/oracle face of [[ngramJaccardPairs]]. O(n²) by
    * construction (the join predicate is id_a < id_b — Spark plans a
    * nested loop), so this is for BOUNDED samples: threshold
    * calibration against ground truth, recall measurement of the LSH
    * face, and the driver's hash oracle. Corpus scale routes through
    * [[ngramJaccardPairs]]; every per-pair value here is bit-identical
    * to what its verify step computes (same shingle set, same
    * [[graft.functions.native.jaccard_sim]]).
    */
  def ngramJaccardAllPairs(df: DataFrame, idCol: String, textCol: String,
                           threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    // shingles SORTED once per doc so the n² verify walks two sorted
    // arrays per pair (sorted_jaccard: no per-pair hash sets) — the
    // difference between a tractable sample sweep and minutes
    val sh = df.select(F.col(idCol).as("id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("id"),
        F.array_sort(native.word_shingles(F.col("__toks"), shingleN)).as("sh"))
    // a sample-sized input usually arrives as ONE file split, which
    // would run the n² nested loop on one core; spreading the stream
    // side costs a trivial shuffle of n rows and buys full parallelism
    val a = sh.select(F.col("id").as("id_a"), F.col("sh").as("sh_a"),
        F.size(F.col("sh")).as("__na"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val b = sh.select(F.col("id").as("id_b"), F.col("sh").as("sh_b"),
      F.size(F.col("sh")).as("__nb"))
    // the threshold sits in the JOIN CONDITION, after the id ordering
    // and the LENGTH FILTER (J ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t, the classic
    // set-similarity-join prune — inter ≤ min, union ≥ max): a
    // post-join .filter would be pushed into the condition AHEAD of
    // `id_a < id_b` (And evaluates left-to-right), doubling the n²
    // jaccard evaluations; here the cheap id + integer-size tests
    // short-circuit the vast majority of pairs before the per-pair
    // sorted-merge walk ever runs. Survivors (a handful) recompute
    // jaccard in the projection — noise next to the n² term avoided.
    val t = F.lit(threshold)
    a.join(b, F.col("id_a") < F.col("id_b") &&
        F.col("__na").cast("double") >= t * F.col("__nb") &&
        F.col("__nb").cast("double") >= t * F.col("__na") &&
        native.sorted_jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
      .select(F.col("id_a"), F.col("id_b"),
        native.sorted_jaccard(F.col("sh_a"), F.col("sh_b")).as("jaccard"))
  }

  /** Exact n-gram Jaccard (|A∩B| / |A∪B| on true shingle sets) over
    * LSH candidates — the estimate-free verify step.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5, shingleN: Int = 3,
                        k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0,
      s"k=$k must be a multiple of bands=$bands (trailing signature slots would be silently unbanded)")
    val sigs = signatures(df, idCol, textCol, k, shingleN)
    val shA = sigs.select(F.col("id").as("id_a"), F.col("sh").as("sh_a"))
    val shB = sigs.select(F.col("id").as("id_b"), F.col("sh").as("sh_b"))
    candidatesFromSignatures(sigs, bands, k / bands)
      .join(shA, "id_a").join(shB, "id_b")
      .select(F.col("id_a"), F.col("id_b"),
        native.jaccard_sim(F.col("sh_a"), F.col("sh_b")).as("jaccard"))
      .filter(F.col("jaccard") >= threshold)
  }

  /** Fuzzy string join (round 14): all pairs within edit distance
    * `maxDist`, for SHORT strings (names, titles, product labels —
    * the entity-resolution shape). Candidate generation is the q-gram
    * signature join: an edit destroys at most q q-grams, so two
    * strings within distance k share at least
    * `max(len) − q + 1 − k·q` q-grams — candidates are COMPLETE
    * whenever `max(len) ≥ q·(k+1)` (q=3, k=2 → length ≥ 9; shorter
    * pairs may be missed — stated, tested). The join is an equi-join
    * on the gram (never a cross join), pre-filtered by the length
    * band |len_a − len_b| ≤ k (an edit changes length by ≤ 1), pairs
    * deduplicated BEFORE the levenshtein verify so each pair pays the
    * O(len²) DP once. The gram explode sits over a staged frame (the
    * Generate re-evaluation rule); per-row gram work is O(len·q) —
    * this is a short-string operator, run it on name columns, not
    * documents.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int = 2, q: Int = 3): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val base = Staging.stageLazy(
      df.select(F.col(idCol).as("id"), F.col(strCol).as("s"))
        .filter(F.col("s").isNotNull)
        .withColumn("len", F.length(F.col("s")))
        .withColumn("gs", F.array_distinct(F.expr(
          s"transform(sequence(1, greatest(length(s) - ${q - 1}, 1)), i -> substring(s, i, $q))"))))
    val grams = base.select(F.col("id"), F.col("s"), F.col("len"),
      F.explode(F.col("gs")).as("g"))
    // Ed-Join prefix filter (Xiao et al. 2008): joining on EVERY gram
    // explodes on shared boilerplate (a common prefix like
    // 'Supplier#0000000' puts all-pairs × shared-gram-count rows
    // through the join — measured 17 s on 1 000 names). Within ED k a
    // pair shares ≥ max(|G|) − kq grams, so under ANY global total
    // order their (kq+1)-PREFIXES must intersect — joining only the
    // kq+1 RAREST grams per string (order: ascending document
    // frequency, gram text as the tiebreak — the same total order on
    // both sides) keeps completeness and makes the join key selective
    // by construction. One extra dictionary-sized aggregate + join;
    // the per-string prefix sort is a bounded array op.
    val dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).as("df"))
    val pk = maxDist * q + 1
    val pref = grams.join(dfreq, Seq("g"))
      .groupBy("id", "s", "len")
      .agg(F.slice(F.array_sort(F.collect_list(
        F.struct(F.col("df").as("df"), F.col("g").as("g")))), 1, pk).as("pref"))
      .select(F.col("id"), F.col("s"), F.col("len"),
        F.explode(F.col("pref")).as("pg"))
      .select(F.col("id"), F.col("s"), F.col("len"), F.col("pg.g").as("g"))
    val a = pref.select(F.col("g"), F.col("id").as("id_a"),
      F.col("s").as("s_a"), F.col("len").as("len_a"))
    val b = pref.select(F.col("g"), F.col("id").as("id_b"),
      F.col("s").as("s_b"), F.col("len").as("len_b"))
    a.join(b, Seq("g"))
      .filter(F.col("id_a") < F.col("id_b") &&
        F.abs(F.col("len_a") - F.col("len_b")) <= maxDist)
      // pair-dedup GROUPS on the ids only (s is functionally
      // determined by id, so first() is exact): the exchange keys are
      // two longs, not two strings, and duplicate pairs from multiple
      // shared prefix grams still collapse map-side (round-14 verdict
      // nit — distinct() carried both strings as grouping keys)
      .groupBy("id_a", "id_b")
      .agg(F.first("s_a").as("s_a"), F.first("s_b").as("s_b"))
      // thresholded 3-arg levenshtein: the banded DP costs O(k·len)
      // instead of O(len²) and returns -1 past the threshold
      .withColumn("dist", F.expr(s"levenshtein(s_a, s_b, $maxDist)"))
      .filter(F.col("dist") >= 0)
      .select(F.col("id_a"), F.col("id_b"), F.col("dist"))
  }

  /** (id, sim) per document, staged: tokens → simhash. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol).as("id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("id"), native.simhash64(F.col("__toks")).as("sim"))

  /** SimHash near-dup pairs: 4×16-bit band blocking, then exact
    * Hamming distance ≤ `maxHamming` verify via bit_count(xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = simhashes(df, idCol, textCol)
    val banded = withSim.select(
      F.col("id"), F.col("sim"),
      F.posexplode(F.array((0 until 4).map(b =>
        F.shiftright(F.col("sim"), b * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).as("hamming"))
      .distinct()
      .filter(F.col("hamming") <= maxHamming)
  }

  /** The hash-oracle face of the C3 surface (same pattern as
    * [[minhashPairsPinned]]): identical pipeline shape — per-token
    * hash → per-bit majority vote → banding → bucket join → Hamming
    * verify — with every hash an explicit md5 so any engine replays
    * the WHOLE pipeline, candidate generation included, as list
    * arithmetic. Token hash = first 8 hex chars of md5 (32 bits);
    * bit j of the fingerprint is set iff the ±1 vote sum over the
    * doc's tokens (MULTIPLICITY counts — every occurrence votes) is
    * strictly positive; banding is `bands` equal slices of the `bits`
    * fingerprint. Production routing stays [[simhashPairs]]
    * (codegen'd xxhash-family `simhash64`, one long op per token);
    * the *logic* — vote fold, band blocking, bit_count verify — is
    * shared shape and gets the full DuckDB gate through this face.
    *
    * The vote fold is `bits` conditional sums inside ONE keyed
    * aggregate (no per-bit explode — the token stream is touched
    * once, map-side partials apply), so the plan shape survives
    * corpus scale even though this face exists for oracle/calibration
    * runs.
    */
  def simhashPairsPinned(df: DataFrame, idCol: String, textCol: String,
                         bits: Int = 52, bands: Int = 4,
                         maxHamming: Int = 4): DataFrame = {
    require(bits > 0 && bits <= 52,
      s"bits=$bits must be in 1..52 (md5-prefix hashes and band buckets must stay exact longs)")
    require(bits % bands == 0, s"bits=$bits must be a multiple of bands=$bands")
    val bandWidth = bits / bands
    val bandMask = (1L << bandWidth) - 1
    // staged per the HOF rule: tokens as their own projection, THEN
    // the explode — and the md5 prefix is plain codegen'd expression
    val toks = df.select(F.col(idCol).as("id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("id"), F.explode(F.col("__toks")).as("tok"))
      .select(F.col("id"),
        F.conv(F.substring(F.md5(F.col("tok")), 1, (bits + 3) / 4), 16, 10)
          .cast("long").bitwiseAND(F.lit((1L << bits) - 1)).as("h"))
    val votes = (0 until bits).map(j =>
      F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__b$j"))
    val sims = toks.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(F.col("id"),
        (0 until bits).map(j =>
          F.when(F.col(s"__b$j") > 0, F.lit(1L << j)).otherwise(F.lit(0L)))
          .reduce(_ + _).as("sim"))
    val banded = sims.select(
      F.col("id"), F.col("sim"),
      F.posexplode(F.array((0 until bands).map(b =>
        F.shiftright(F.col("sim"), b * bandWidth).bitwiseAND(F.lit(bandMask))): _*))
        .as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).as("hamming"))
      .distinct()
      .filter(F.col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: IVF-style blocking on a coarse cell id
    * (here the precomputed cluster `label`), exact cosine inside each
    * cell. At 100 TB the cell id comes from a coarse quantizer; the
    * join stays a keyed equi-join either way. Blind spot by design:
    * near-dups STRADDLING a cell boundary are never candidates — use
    * `embeddingPairsLsh` when cross-cell recall matters.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
                     threshold: Double = 0.95): DataFrame = {
    val e = df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"), F.col(cellCol).as("cell"))
    e.as("a").join(e.as("b"),
        F.col("a.cell") === F.col("b.cell") && F.col("a.id") < F.col("b.id"))
      .withColumn("cos", native.cosine_sim(F.col("a.v"), F.col("b.v")))
      .filter(F.col("cos") >= threshold)
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"), F.col("cos"))
  }

  /** Linear-output TEXT dedup routing — `embeddingDropList`'s shape for
    * documents: exact clusters collapse on the C1 content hash first
    * (the pathological quadratic buckets vanish before LSH), MinHash
    * near-dup runs on representatives only, output is one
    * (drop_id, keep_id, reason ∈ exact|near, est_jaccard) row per
    * duplicate. See `embeddingDropList` for the full scale rationale.
    */
  def textDropList(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5, k: Int = 64, bands: Int = 16): DataFrame =
    dropList(
      df.select(F.col(idCol).as("id"), F.col(textCol).as("t"))
        .withColumn("__key", F.md5(F.col("t"))),
      simCol = "est_jaccard",
      nearPairsOfReps = reps => minhashPairs(reps.select("id", "t"), "id", "t", k, bands, threshold))

  /** Shared drop-list assembly (C7/C8): `e` is (id, __key, payload...)
    * where `__key` is the exact-equality key. One groupBy+join pair on
    * `__key` (exchange reuse) collapses exact clusters; `nearPairsOfReps`
    * generates verified (id_a, id_b, simCol) pairs over representatives
    * only; the min-struct aggregate picks each dropped rep's lowest-id
    * witness. Output: one (drop_id, keep_id, reason, simCol) row per
    * duplicate.
    */
  private def dropList(e: DataFrame, simCol: String,
                       nearPairsOfReps: DataFrame => DataFrame): DataFrame = {
    val payloadCols = e.columns.filter(c => c != "id" && c != "__key").toSeq
    // ONE aggregate yields the representative (min-id) row per key —
    // min_by over the full-row struct, so no join-back is needed to
    // recover the representative's payload. This matters because the
    // reps subtree is instantiated several times downstream (both LSH
    // banding sides + both verify-join sides): as a single scan+agg it
    // costs a fraction of the old groupBy+join shape per instance
    // (the old shape re-scanned the source twice per use — 20 scans
    // in the droplist plan; this one plans 6)
    val rep = e.groupBy("__key").agg(
      F.min_by(F.struct(("id" +: payloadCols).map(F.col): _*), F.col("id")).as("__rep"))
    val exactDrops = e.join(rep.select(F.col("__key"), F.col("__rep.id").as("rep_id")), "__key")
      .filter(F.col("id") =!= F.col("rep_id"))
      .select(F.col("id").as("drop_id"), F.col("rep_id").as("keep_id"),
        F.lit("exact").as("reason"), F.lit(1.0).as(simCol))
    val reps = rep.select(
      F.col("__rep.id").as("id") +: payloadCols.map(c => F.col(s"__rep.$c").as(c)) :+ F.col("__key"): _*)
    val nearDrops = nearPairsOfReps(reps)
      .groupBy(F.col("id_b").as("drop_id"))
      .agg(F.min(F.struct(F.col("id_a").as("keep_id"), F.col(simCol))).as("m"))
      .select(F.col("drop_id"), F.col("m.keep_id"),
        F.lit("near").as("reason"), F.col(s"m.$simCol"))
    exactDrops.unionByName(nearDrops)
  }

  /** Linear-output embedding dedup ROUTING: who to drop, not all pairs.
    *
    * The pairs APIs (`embeddingPairs*`) are quadratic in
    * duplicate-cluster size BY CONTRACT — a document duplicated c
    * times contributes c·(c−1)/2 pairs, so one viral boilerplate doc
    * repeated 10⁶ times yields ~5·10¹¹ output rows (ScaleProbe
    * measures exactly this blow-up: ×10 exact replicas made the pair
    * query 34× slower at 10× data). A dedup pipeline doesn't need the
    * pairs; it needs the DROP LIST. This routing keeps every stage
    * linear in duplicate mass:
    *
    *  1. exact collapse — group by the vector VALUE (no hash-collision
    *     caveat), one shuffle with map-side combine; each exact cluster
    *     reduces to its min-id representative, and the (id → rep)
    *     assignment is one row per duplicate;
    *  2. near-dup LSH runs on REPRESENTATIVES ONLY — the pathological
    *     quadratic case (exact-duplicate buckets) no longer exists by
    *     construction, and candidate fan-out is bounded by banding as
    *     usual;
    *  3. a representative drops if ANY verified neighbor has a smaller
    *     id (min-struct aggregate, one shuffle) — one row per dropped
    *     rep, witness pair attached.
    *
    * Output: (drop_id, keep_id, reason ∈ exact|near, cos); each
    * dropped id appears EXACTLY once. `keep_id` is the dedup witness,
    * not a transitive canonical root — survivors are the ids absent
    * from the drop list (single pass, no union-find iteration; every
    * dropped id chains to a survivor).
    */
  def embeddingDropList(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 48, bands: Int = 8,
                        multiprobe: Boolean = true): DataFrame =
    dropList(
      // the vector VALUE is its own exact-equality key (no
      // hash-collision caveat) — selected ONCE so the collapse
      // exchanges move one copy of the array, not two
      df.select(F.col(idCol).as("id"), F.col(vecCol).as("__key")),
      simCol = "cos",
      nearPairsOfReps = reps => embeddingPairsLsh(
        reps.select(F.col("id").as("rid"), F.col("__key").as("v")), "rid", "v",
        threshold, planes, bands, multiprobe))

  /** Transitive duplicate CLUSTERS over a near-dup pair set: connected
    * components by alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" — the published
    * O(log² n)-round algorithm; the reference's BigQuery users script
    * this as an iterative MERGE loop). The pairs/droplist APIs stop at
    * witness edges (A~B, B~C may keep both B and C); clustering gives
    * each document its canonical min-id root, so "keep one per cluster"
    * is a single filter on `id = root`.
    *
    * Each round is two keyed aggregate+join passes over the edge set —
    * no collect, no driver-side graph. The edge set only shrinks toward
    * the final star edges (one per non-root node, ≤ initial |pairs|),
    * and lineage is truncated per round via [[Staging.stage]]: pass
    * `checkpointDir = Some(dir)` on a real cluster (durable stages —
    * an executor loss mid-iteration recomputes from files; each round
    * drops the previous round's stage, the last one lives until the
    * caller deletes `dir`), leave `None` on local[n] (executor-block
    * `localCheckpoint`). Convergence is detected by a
    * (count, hash-sum) signature — two scalar aggregates, no edge-set
    * diff shuffle; `maxIter` (default 30 ≳ log²(10⁹)) bounds the loop
    * and non-convergence throws rather than returning a wrong answer.
    *
    * Output: one (id, root, cluster_size) row per node appearing in
    * `pairs`; roots map to themselves. Singleton documents never appear
    * (they have no pairs) — callers wanting them can left-join.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 30,
                          checkpointDir: Option[String] = None): DataFrame = {
    // canonical undirected edges u < v; null ids can't cluster
    val init = pairs
      .select(F.least(F.col(aCol), F.col(bCol)).as("u"),
        F.greatest(F.col(aCol), F.col(bCol)).as("v"))
      .filter(F.col("u").isNotNull && F.col("u") =!= F.col("v"))
      .distinct()

    // large-star: every neighbor v > u re-points to m = min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(F.col("v").as("u"), F.col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(F.min("v").as("mv"))
        .select(F.col("u"), F.least(F.col("mv"), F.col("u")).as("m"))
      nbrs.join(mins, "u").filter(F.col("v") > F.col("u"))
        .select(F.col("m").as("u"), F.col("v")) // m <= u < v keeps u < v canonical
        .distinct()
    }
    // small-star: every strictly-smaller neighbor (and v itself)
    // re-points to m = min of v's smaller neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("v").agg(F.min("u").as("m"))
      e.join(mins, "v").filter(F.col("u") =!= F.col("m"))
        .select(F.col("m").as("u"), F.col("u").as("v"))
        .union(mins.select(F.col("m").as("u"), F.col("v")))
        .distinct()
    }
    // (count, xor of per-edge hashes): order-independent, overflow-free
    // under ANSI (a sum of hashes would overflow), distinct edges so no
    // xor self-cancellation
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(F.col("u"), F.col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var edges = Staging.stage(init, checkpointDir, "edges-0")
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      edges = Staging.stage(smallStar(largeStar(edges)), checkpointDir, s"edges-${iter + 1}")
      // the new stage is durable: the previous round's files are garbage
      checkpointDir.foreach(d => Staging.drop(pairs.sparkSession, s"$d/edges-$iter"))
      val next = signature(edges)
      converged = next == sig
      sig = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds (|edges|=${sig._1})")
    // converged edges are stars (root=u, child=v): emit children + roots
    val members = edges.select(F.col("v").as("id"), F.col("u").as("root"))
      .union(edges.select(F.col("u").as("id"), F.col("u").as("root")).distinct())
    val sizes = members.groupBy("root").agg(F.count(F.lit(1)).as("cluster_size"))
    members.join(sizes, "root").select("id", "root", "cluster_size")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication") — cluster-bounded
    * semantic dedup over an embedding column. The published recipe:
    * k-means-cluster the embeddings, compare pairs ONLY within a
    * cluster (clustering is what makes all-pairs tractable at
    * web scale), connect pairs with cosine ≥ `tau`, and keep per
    * duplicate group the member with the LOWEST cosine to its cluster
    * centroid — the paper's rule: boundary examples carry more signal
    * than the cluster's archetype.
    *
    * Composition of existing machinery: `centroids` is a
    * [[Similarity.trainCentroids]] frame (or any pinned (cell,
    * centroid) table — the persisted-artifact lifecycle; assignment is
    * the map-only `nearest_cell` native expression, identical to the
    * IVF routing), duplicate groups come from [[connectedComponents]]
    * (cross-CELL edges cannot exist by construction, but transitive
    * within-cell chains collapse exactly), and the keep rule is one
    * `min_by` over (cos_to_centroid, id) per group.
    *
    * Output: one row per input vector — (idCol, cell, component,
    * cos_centroid, keep); singletons keep themselves (component = own
    * id). Filtering is `.where(col("keep"))`.
    *
    * Scale shape: one broadcast-assignment map pass, one self-join
    * shuffled on cell (quadratic IN THE CELL — size cells via the
    * centroid count so n/cells stays bounded; AQE splits residual hot
    * cells), the C9 component rounds on the (much smaller) duplicate
    * edge set, and two keyed joins to decorate. At 100 TB: cells ≈
    * corpus/10⁴ keeps every cell's pair block in one task's reach, and
    * the edge set entering connectedComponents is output-sized (only
    * pairs ≥ tau), not corpus-sized.
    */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, tau: Double,
                    checkpointDir: Option[String] = None): DataFrame = {
    val cent = Similarity.collectCentroids(centroids)
    val assigned = vecs
      .select(F.col(idCol).as("id"), F.col(vecCol).as("__v"))
      .withColumn("__cell",
        native.nearest_cell(F.col("__v"), cent.map(_._1).toSeq, cent.map(_._2).toSeq))
    val withC = assigned
      .join(F.broadcast(centroids.select(
        F.col("cell").cast("long").as("__cell"), F.col("centroid").as("__c"))), Seq("__cell"))
      .withColumn("__ccos", native.cosine_sim(F.col("__v"), F.col("__c")))
      .select("id", "__cell", "__v", "__ccos")
    val pairs = withC.select(F.col("id").as("id_a"), F.col("__cell"), F.col("__v").as("__va"))
      .join(withC.select(F.col("id").as("id_b"), F.col("__cell"), F.col("__v").as("__vb")),
        Seq("__cell"))
      .filter(F.col("id_a") < F.col("id_b"))
      .filter(native.cosine_sim(F.col("__va"), F.col("__vb")) >= tau)
      .select("id_a", "id_b")
    val comps = connectedComponents(pairs, "id_a", "id_b", checkpointDir = checkpointDir)
    val joined = withC.join(comps.select(F.col("id"), F.col("root")), Seq("id"), "left")
    // per group: keep the boundary member — lowest (cos_to_centroid, id)
    val keepers = joined.filter(F.col("root").isNotNull)
      .groupBy("root")
      .agg(F.min_by(F.col("id"), F.struct(F.col("__ccos"), F.col("id"))).as("__keep_id"))
    joined.join(keepers, Seq("root"), "left")
      .select(F.col("id").as(idCol),
        F.col("__cell").as("cell"),
        F.coalesce(F.col("root"), F.col("id")).as("component"),
        F.col("__ccos").as("cos_centroid"),
        (F.col("root").isNull || F.col("id") === F.col("__keep_id")).as("keep"))
  }

  /** Embedding near-dup pairs WITHOUT a blocking column: hyperplane-LSH
    * banding generates candidates (cross-cell capable), exact cosine
    * verifies. Asymmetric multiprobe keeps the self-join linear: one
    * side emits its exact band buckets, the other also emits every
    * Hamming-1 variant — a near-threshold pair missing one band plane
    * still collides, at ×(1+bandBits) fan-out on a single side.
    */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 48, bands: Int = 8,
                        multiprobe: Boolean = true): DataFrame = {
    val renamed = df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    def banded(probe: Boolean): DataFrame =
      Lsh.hyperplaneBands(renamed, "id", "v", planes, bands, probe)
    val candidates = banded(probe = multiprobe).as("a")
      .join(banded(probe = false).as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .distinct()
    val vecs = df.select(F.col(idCol).as("id"), F.col(vecCol).as("v"))
    candidates
      .join(vecs.select(F.col("id").as("id_a"), F.col("v").as("v_a")), "id_a")
      .join(vecs.select(F.col("id").as("id_b"), F.col("v").as("v_b")), "id_b")
      .select(F.col("id_a"), F.col("id_b"),
        native.cosine_sim(F.col("v_a"), F.col("v_b")).as("cos"))
      .filter(F.col("cos") >= threshold)
  }
}
