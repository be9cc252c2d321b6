package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Vector math over `array<float>` embedding columns, built entirely
  * from codegen'd higher-order functions (`zip_with`, `aggregate`) —
  * no UDFs, so the whole similarity pipeline stays inside whole-stage
  * codegen and is safe to run over 100 TB of embeddings.
  */
object vectors {

  /** Σ aᵢ·bᵢ with both multiplication and accumulation in double
    * precision (float×float products would drift ~1e-7 per element —
    * enough to break oracle parity after 64 dims).
    */
  def dot(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      F.lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of a deterministic pseudo-random hyperplane projection;
    * used for random-hyperplane LSH. Plane `p` (0-based) for dimension
    * `i` has weight hash(p, i) mapped to [-1, 1].
    */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Int = 42): Column = {
    val bits = (0 until planes).map { p =>
      // weight_i = xxhash64(seed, p, i) scaled to [-1,1]; the projection
      // sign is the LSH bit. All expressible with aggregate over the
      // zipped (value, index) pairs.
      val proj = F.aggregate(
        F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1),
          (v, i) => v * (F.xxhash64(F.lit(seed), F.lit(p), i).cast("double") / F.lit(Long.MaxValue.toDouble))),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(proj >= 0, F.lit(1L << p)).otherwise(F.lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
