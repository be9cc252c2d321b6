package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.native
import graft.sources.{Layout, Tables}

/** Z-order (Morton) clustered layout: the curve itself, and the
  * physical effect that justifies it — per-file min/max stats narrow
  * on BOTH cluster keys, so predicates on either key prune files.
  */
class ZOrderSpec extends SparkSuite {

  test("morton interleave: exact bit weave and per-coordinate monotonicity") {
    import spark.implicits._
    // x=0101, y=0011 → even bits from x, odd from y:
    // (y3 x3 y2 x2 y1 x1 y0 x0) = 00011011 = 27
    val one = Seq((5L, 3L)).toDF("x", "y")
      .select(native.morton_interleave(F.col("x"), F.col("y"), 4)).head().getLong(0)
    assert(one == 27L)
    val grid = (for { x <- 0L to 15L; y <- 0L to 15L } yield (x, y)).toDF("x", "y")
    val zs = grid.select(F.col("x"), F.col("y"),
        native.morton_interleave(F.col("x"), F.col("y"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // all 256 z-values over a 16×16 grid with 4 bits are distinct
    assert(zs.values.toSet.size == 256)
    // monotone in each coordinate: dominance in (x,y) ⟹ dominance in z
    for (((x1, y1), z1) <- zs; ((x2, y2), z2) <- zs
         if x1 <= x2 && y1 <= y2)
      assert(z1 <= z2, s"($x1,$y1)→$z1 vs ($x2,$y2)→$z2")
    // out-of-range bits are masked, not wrapped into neighbours' range
    val masked = Seq((16L + 5L, 3L)).toDF("x", "y")
      .select(native.morton_interleave(F.col("x"), F.col("y"), 4)).head().getLong(0)
    assert(masked == 27L)
  }

  test("z-ordered layout: per-file spans narrow on BOTH keys and beat a linear sort's pruning") {
    val orders = Tables.orders(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    val zpath = base + "/z"
    val lpath = base + "/linear"
    Layout.writeZOrdered(orders, zpath, "o_custkey", "o_totalprice", numFiles = 16)
    orders.repartitionByRange(16, F.col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(lpath)

    val bounds = orders.agg(
      F.min("o_custkey").cast("double"), F.max("o_custkey").cast("double"),
      F.min("o_totalprice").cast("double"), F.max("o_totalprice").cast("double")).head()
    def dom(lo: Double, hi: Double) = math.max(hi - lo, 1e-9)
    val (cLo, cHi, pLo, pHi) =
      (bounds.getDouble(0), bounds.getDouble(1), bounds.getDouble(2), bounds.getDouble(3))

    def spans(path: String, col: String): Seq[(Double, Double)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(F.min(F.col(col)).cast("double"), F.max(F.col(col)).cast("double")).head()
          (r.getDouble(0), r.getDouble(1))
        }
    def avgSpan(ss: Seq[(Double, Double)], lo: Double, hi: Double): Double =
      ss.map { case (a, b) => (b - a) / dom(lo, hi) }.sum / ss.size

    val zCust = spans(zpath, "o_custkey")
    val zPrice = spans(zpath, "o_totalprice")
    val lCust = spans(lpath, "o_custkey")
    val lPrice = spans(lpath, "o_totalprice")
    assert(zCust.size >= 8, s"expected >=8 z files, got ${zCust.size}")

    // the linear layout clusters its leading key tightly…
    assert(avgSpan(lCust, cLo, cHi) <= 0.25, s"linear custkey span ${avgSpan(lCust, cLo, cHi)}")
    // …but its trailing key stays ~the whole domain per file
    assert(avgSpan(lPrice, pLo, pHi) >= 0.8, s"linear price span ${avgSpan(lPrice, pLo, pHi)}")
    // the z layout is narrow on BOTH keys
    assert(avgSpan(zCust, cLo, cHi) <= 0.6, s"z custkey span ${avgSpan(zCust, cLo, cHi)}")
    assert(avgSpan(zPrice, pLo, pHi) <= 0.6, s"z price span ${avgSpan(zPrice, pLo, pHi)}")

    // file-stat pruning model (what a table format's file-skipping
    // does with these stats): a centered 10%-of-domain predicate on
    // the NON-leading key must touch fewer z files than linear files
    val mid = (pLo + pHi) / 2
    val w = dom(pLo, pHi) * 0.05
    def hit(ss: Seq[(Double, Double)]) = ss.count { case (a, b) => a <= mid + w && b >= mid - w }
    assert(hit(zPrice) < hit(lPrice),
      s"z pruning (${hit(zPrice)}/${zPrice.size}) must beat linear (${hit(lPrice)}/${lPrice.size})")

    // null keys bucket to the origin corner instead of getting a null
    // z-value (which would park them un-clustered, nulls-first)
    val withNulls = orders.withColumn("o_totalprice",
      F.when(F.col("o_orderkey") % 100 === 0, F.lit(null)).otherwise(F.col("o_totalprice")))
    Layout.writeZOrdered(withNulls, base + "/znull", "o_custkey", "o_totalprice", numFiles = 4)
    assert(spark.read.parquet(base + "/znull").count() == orders.count())

    // layout is a reorganization, not a transformation
    assert(spark.read.parquet(zpath).count() == orders.count())
    assert(spark.read.parquet(zpath).agg(F.sum(F.crc32(F.concat_ws(",",
        F.col("o_orderkey"), F.col("o_custkey"))))).head().getLong(0) ==
      orders.agg(F.sum(F.crc32(F.concat_ws(",",
        F.col("o_orderkey"), F.col("o_custkey"))))).head().getLong(0))
  }
}
