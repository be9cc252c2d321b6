package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.native

/** Trainless text embeddings by SIGNED FEATURE HASHING (Weinberger et
  * al. 2009; the fastText-without-training shape): a document's
  * unigram+bigram stream hashes into 2·dim buckets, the upper half
  * carrying −1 and the lower +1, scattered into a dense dim-wide
  * INTEGER vector. Deliberately not a learned model — it is the
  * deterministic, engine-native embedder that makes the rest of the
  * vector stack self-contained: its integer components feed
  * [[Clustering.kmeansAssign]] / [[Dedup]] / int8 ANN EXACTLY (no
  * quantization step, no float drift), and [[normalized]] yields the
  * cosine-ready float form for [[Similarity]] retrieval. A learned
  * embedding model drops into the same column contract.
  *
  * Hash law: the repo-wide 52-bit md5 prefix ([[Dsir.bucketOf]], the
  * S2 recipe) — engine-independent, so the WHOLE embedder replays in
  * a SQL oracle and the driver face is hash-gated.
  *
  * Scale shape: tokens → grams → hashes are per-row projections
  * (staged per the §4 HOF rule inside [[Dsir.bucketStream]]); the
  * scatter is one codegen'd map-only expression (O(grams + dim) per
  * row). Embedding generation touches each document once and never
  * shuffles — at 100 TB it is a pure map stage ahead of the
  * cluster/dedup/ANN pipelines.
  */
object Embedding {

  /** (idCol, embedding array<int>) — dim-wide signed hashed counts. */
  def hashEmbedding(docs: DataFrame, idCol: String, textCol: String,
                    dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    Dsir.bucketStream(docs, idCol, textCol, buckets = 2 * dim)
      .select(F.col(idCol),
        native.hashed_bag_vector(F.col("__buckets"), dim).as("embedding"))
  }

  /** The cosine-ready float form: L2-normalized hashed embedding
    * (per-row deterministic double fold, cast back to float — the
    * [[graft.functions.native.l2_normalize]] contract; an all-zero
    * vector stays zero).
    */
  def normalized(docs: DataFrame, idCol: String, textCol: String,
                 dim: Int): DataFrame =
    hashEmbedding(docs, idCol, textCol, dim)
      .select(F.col(idCol),
        native.l2_normalize(F.col("embedding").cast("array<float>")).as("embedding"))
}
