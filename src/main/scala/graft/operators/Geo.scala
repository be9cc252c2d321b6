package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Scale-shaped spatial pair-finding — the geo analog of the LSH band
  * join: grid-cell bucketing generates a bounded candidate set, an
  * exact great-circle verify keeps only true pairs. Never an all-pairs
  * join.
  *
  * Spark has no native spatial join; BigQuery executes
  * `SELECT ... FROM a JOIN b ON ST_DWITHIN(a.g, b.g, r)` with its S2
  * covering machinery. This is the same idea on a plain lng/lat grid:
  *   - every LEFT point keys to exactly ONE cell of side
  *     `radius/111000°` (larger than the latitude span of any
  *     qualifying pair, so ±1 lat cell always covers it);
  *   - every RIGHT point explodes to its neighbor window — ±1 cell in
  *     latitude, ±(⌊span/cell⌋+1) in longitude where the span widens
  *     by 1/cos(lat) (a longitude degree shrinks toward the poles),
  *     computed per row from the worst-case latitude in its window;
  *   - candidates equi-join on the cell (a plain shuffle join on a
  *     bounded-fan-out key — broadcastable when one side is small);
  *   - the exact haversine predicate verifies each candidate.
  * Each true pair appears EXACTLY once: the left point owns one cell
  * and the right point emits that cell at most once.
  *
  * Cost: |L| + |R|·(3·(2·nx+1)) candidate rows, nx ≈ 1 at temperate
  * latitudes (9 cells/point), growing as 1/cos(lat) toward the poles —
  * rows beyond `maxAbsLat` (default 85°, nx ≈ 12) fail LOUDLY rather
  * than silently exploding the fan-out. Longitude does not wrap:
  * pairs straddling the ±180 antimeridian are NOT found (stated — the
  * same planar-model line as the ray-cast predicates; shift the frame
  * or split the data at the seam when the fleet sails there).
  *
  * At 100 TB: candidates shuffle on the cell key whose fan-out is
  * geometry-bounded, output is bounded by true pairs — the same
  * survival argument as Dedup.minhashPairs' banded join (SURVEY §6).
  */
object Geo {

  /** Meters per degree of latitude on the R = 6371010 m sphere. */
  val MetersPerDegLat: Double = math.Pi / 180.0 * 6371010.0

  /** Great-circle haversine distance in meters — the same formula
    * (and therefore the same few-ulp behavior) as the SQL surface's
    * ST_DISTANCE (sql/Functions.stHaversine).
    */
  def haversineMeters(aLng: Column, aLat: Column, bLng: Column, bLat: Column): Column = {
    val dlat = F.sin(F.radians((bLat - aLat) / 2.0))
    val dlng = F.sin(F.radians((bLng - aLng) / 2.0))
    F.lit(2.0 * 6371010.0) * F.asin(F.sqrt(
      dlat * dlat + F.cos(F.radians(aLat)) * F.cos(F.radians(bLat)) * dlng * dlng))
  }

  /** All (left, right) row pairs within `radiusMeters` great-circle
    * distance. `left`/`right` carry caller-chosen payload columns
    * (names must be disjoint) plus their lng/lat columns; the result
    * is left.* ++ right.* ++ `distance_m`.
    */
  def dwithinJoin(left: DataFrame, lLng: String, lLat: String,
                  right: DataFrame, rLng: String, rLat: String,
                  radiusMeters: Double, maxAbsLat: Double = 85.0): DataFrame = {
    require(radiusMeters > 0, s"radiusMeters must be positive, got $radiusMeters")
    require(maxAbsLat > 0 && maxAbsLat <= 89.0,
      s"maxAbsLat must be in (0, 89], got $maxAbsLat")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both carry: ${overlap.mkString(", ")}")
    val cellDeg = radiusMeters / 111000.0
    // domain guard INSIDE the lazy plan (map-side, loud): a silent
    // clamp would quietly miss pairs near the poles
    def guard(lat: Column): Column =
      F.when(F.assert_true(F.abs(lat) <= maxAbsLat,
        F.lit(s"dwithinJoin: |lat| must be <= $maxAbsLat (pole-adjacent cells " +
          "explode the longitude fan-out; shift the frame or raise maxAbsLat)")).isNull,
        lat)
    def cx(lng: Column): Column = F.floor(lng / cellDeg).cast("long")
    def cy(lat: Column): Column = F.floor(guard(lat) / cellDeg).cast("long")

    val lc = left
      .withColumn("__cx", cx(F.col(lLng)))
      .withColumn("__cy", cy(F.col(lLat)))
    // worst-case latitude within the row's ±1-cell window decides the
    // longitude span; ⌊span/cell⌋+1 cells each side then always cover
    // the left cell of a qualifying pair
    val worstLat = F.least(F.lit(89.9), F.abs(F.col(rLat)) + F.lit(cellDeg))
    val spanDeg = F.lit(radiusMeters) / (F.lit(MetersPerDegLat) * F.cos(F.radians(worstLat)))
    val nx = (F.floor(spanDeg / cellDeg) + 1).cast("int")
    val rcx = cx(F.col(rLng))
    val rcy = cy(F.col(rLat))
    val cells = F.flatten(F.transform(F.sequence(F.lit(-1), F.lit(1)), dy =>
      F.transform(F.sequence(-F.col("__nx"), F.col("__nx")), dx =>
        F.struct((rcx + dx.cast("long")).as("cx"), (rcy + dy.cast("long")).as("cy")))))
    val rc = right
      .withColumn("__nx", nx)
      .withColumn("__cell", F.explode(cells))
      .withColumn("__cx", F.col("__cell.cx"))
      .withColumn("__cy", F.col("__cell.cy"))
      .drop("__nx", "__cell")

    val dist = haversineMeters(F.col(lLng), F.col(lLat), F.col(rLng), F.col(rLat))
    lc.join(rc, Seq("__cx", "__cy"))
      .withColumn("distance_m", dist)
      .filter(F.col("distance_m") <= radiusMeters)
      .drop("__cx", "__cy")
  }
}
