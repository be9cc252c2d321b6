package graft

import graft.operators.Geo
import org.apache.spark.sql.{functions => F}

/** Geo.dwithinJoin: the grid-cell candidate join must find EXACTLY the
  * brute-force pair set — including near the latitude where the
  * longitude window must widen — each pair exactly once, and must
  * refuse pole-adjacent latitudes loudly instead of silently missing
  * pairs or exploding the fan-out.
  */
class GeoSpec extends SparkSuite {
  private lazy val sqlImp = spark.implicits
  import sqlImp._

  private def points(n: Int, idBase: Long, latBase: Double) =
    (0 until n).map { i =>
      (idBase + i,
        (i * 37 % 100) / 10.0 - 5.0,          // lng in [-5, 5), 0.1 steps
        latBase + (i * 53 % 60) / 10.0)       // lat in [base, base+6)
    }

  test("dwithinJoin equals brute force, each pair once, at temperate and high latitude") {
    for (latBase <- Seq(-3.0, 62.0)) {
      val l = points(80, 1000, latBase).toDF("lid", "l_lng", "l_lat")
      val r = points(60, 2000, latBase + 0.05).toDF("rid", "r_lng", "r_lat")
      val radius = 30000.0
      val got = Geo.dwithinJoin(l, "l_lng", "l_lat", r, "r_lng", "r_lat", radius)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      val brute = l.crossJoin(r)
        .withColumn("d", Geo.haversineMeters(
          F.col("l_lng"), F.col("l_lat"), F.col("r_lng"), F.col("r_lat")))
        .filter(F.col("d") <= radius)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"latBase=$latBase: duplicate pairs emitted")
      assert(got.toSet == brute.toSet,
        s"latBase=$latBase: grid join != brute force (${got.size} vs ${brute.size})")
      assert(brute.nonEmpty, s"latBase=$latBase: fixture found no pairs — test is vacuous")
    }
  }

  test("dwithinJoin is loud beyond maxAbsLat and rejects colliding column names") {
    val l = Seq((1L, 0.0, 87.0)).toDF("lid", "l_lng", "l_lat")
    val r = Seq((2L, 0.0, 87.0)).toDF("rid", "r_lng", "r_lat")
    val ex = intercept[Exception] {
      Geo.dwithinJoin(l, "l_lng", "l_lat", r, "r_lng", "r_lat", 1000.0).collect()
    }
    def msgs(t: Throwable): String =
      Option(t).map(x => x.getMessage + msgs(x.getCause)).getOrElse("")
    assert(msgs(ex).contains("maxAbsLat") || msgs(ex).contains("|lat|"))
    val lr = Seq((1L, 0.0, 1.0)).toDF("id", "lng", "lat")
    val rr = Seq((2L, 0.0, 1.0)).toDF("id", "lng", "lat")
    val ex2 = intercept[IllegalArgumentException] {
      Geo.dwithinJoin(lr, "lng", "lat", rr, "lng", "lat", 1000.0)
    }
    assert(ex2.getMessage.contains("disjoint"))
  }

  test("dwithinJoin plan is a shuffle/broadcast EQUI-join on the cell, never all-pairs") {
    val l = points(50, 0, 10.0).toDF("lid", "l_lng", "l_lat")
    val r = points(50, 100, 10.0).toDF("rid", "r_lng", "r_lat")
    val p = Geo.dwithinJoin(l, "l_lng", "l_lat", r, "r_lng", "r_lat", 20000.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }
}
