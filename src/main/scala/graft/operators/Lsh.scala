package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.native

/** Shared hyperplane-LSH banding — the single source of truth for the
  * band/bucket bit layout used by ANN search (`Similarity.lshTopK`)
  * and cross-cell embedding dedup (`Dedup.embeddingPairsLsh`). A
  * change to the signature seed, band slicing, or probe set happens
  * here once; two hand-kept copies of this bit-twiddling WILL drift.
  */
object Lsh {

  /** One (id[, vec], band, bucket) row per band — or per (band,
    * Hamming-1 bucket variant) when `probe` is set: multiprobe emits
    * the exact bucket plus every single-bit flip, so a near-miss on
    * one plane of a band still collides with its exact-bucket
    * counterpart. The signature is staged as its own projection (row
    * slots evaluate once; embedded subtrees rely on CSE).
    */
  def hyperplaneBands(df: DataFrame, idCol: String, vecCol: String,
                      planes: Int, bands: Int, probe: Boolean,
                      keepVec: Boolean = false): DataFrame = {
    require(planes % bands == 0, s"planes=$planes must be a multiple of bands=$bands")
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val keep = if (keepVec) Seq(F.col(idCol), F.col(vecCol)) else Seq(F.col(idCol))
    val sigged = df.select(keep :+ native.hyperplane_sig(F.col(vecCol), planes).as("__sig"): _*)
    val pairs = for {
      b <- 0 until bands
      v <- 0 to (if (probe) bandBits else 0)
    } yield {
      val base = F.shiftright(F.col("__sig"), b * bandBits).bitwiseAND(mask)
      val bucket = if (v == 0) base else base.bitwiseXOR(F.lit(1L << (v - 1)))
      F.struct(F.lit(b).as("band"), bucket.as("bucket"))
    }
    sigged.select(keep :+ F.explode(F.array(pairs: _*)).as("bb"): _*)
      .select(keep :+ F.col("bb.band").as("band") :+ F.col("bb.bucket").as("bucket"): _*)
  }
}
