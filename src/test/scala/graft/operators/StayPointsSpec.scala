package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd
import graft.functions.geo
import graft.geo.Gade

/** Stay-point anchors vs an O(n^2) per-track scan, with boundary
  * cases directed at the window edges (exceedance exactly at t+dwell,
  * distance exactly at the radius, track ending inside the window).
  */
class StayPointsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val R = graft.geo.Ellipsoids.MeanEarthRadius
  val Radius = 500.0 // m
  val Dwell = 3600000L // 1 h

  // fixes: mostly ~100 m jitter around a per-track center, a 5 km
  // excursion every 7th fix, ~10-min cadence with jitter
  def mkFixes(n: Int): Seq[(Long, Long, Long, Double, Double)] =
    (0 until n).map { i =>
      val trk = (rnd(i * 13L) * 5).toLong
      val t = i.toLong * 600000L + (rnd(i * 17L + 1) * 300000L).toLong
      val far = if (i % 7 == 0) 5000.0 else 0.0
      val dLat = ((rnd(i * 19L + 2) - 0.5) * 200.0 + far) / R
      val dLon = ((rnd(i * 23L + 3) - 0.5) * 200.0) / R
      (trk, i.toLong, t, math.toRadians(40.0 + trk) + dLat, math.toRadians(10.0) + dLon)
    }

  def brute(rows: Seq[(Long, Long, Long, Double, Double)]): Map[Long, Boolean] =
    rows.groupBy(_._1).flatMap { case (_, fs) =>
      val tmax = fs.map(_._3).max
      fs.map { case (_, id, t, la, lo) =>
        val a = Gade.latLonToNvec(la, lo)
        val inWindow = fs.filter(f => f._3 > t && f._3 <= t + Dwell)
        val ok = inWindow.forall { f =>
          val b = Gade.latLonToNvec(f._4, f._5)
          val d = math.atan2(a.cross(b).norm, a.dot(b)) * R
          d <= Radius
        }
        id -> (ok && tmax >= t + Dwell)
      }
    }

  def run(rows: Seq[(Long, Long, Long, Double, Double)]): Map[Long, Boolean] = {
    import spark.implicits._
    val df = rows.toDF("trk", "id", "t", "lat", "lon")
      .withColumn("n", geo.nvec(col("lat"), col("lon")))
    StayPoints.stayAnchors(df, "trk", "id", "t", "n", Radius, Dwell)
      .select("id", "is_stay").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("matches the per-track quadratic scan") {
    val rows = mkFixes(300)
    val got = run(rows)
    val want = brute(rows)
    assert(got.size == rows.size)
    assert(got === want,
      s"diff: ${got.toSet.diff(want.toSet).take(5)} vs ${want.toSet.diff(got.toSet).take(5)}")
  }

  test("window-edge semantics: exceedance at exactly t+dwell counts; d == radius stays") {
    // track 1: anchor at t=0; a fix exactly at t+Dwell sits 5 km out
    // -> it IS inside the (t, t+dwell] window, so NOT a stay
    // track 2: same shape but the far fix is 1 ms later -> outside the
    // window; it also certifies coverage -> IS a stay
    // track 3: farthest in-window fix at exactly the radius -> stay
    // track 4: ends before t+dwell -> unknown dwell -> not a stay
    val lat0 = math.toRadians(40.0)
    val lon0 = math.toRadians(10.0)
    val dFar = 5000.0 / R
    // a hair inside / outside the radius: the exact-radius point is a
    // 1-ulp coin flip through atan2, so probe both sides of it
    val dIn = (Radius * (1.0 - 1e-9)) / R
    val dOut = (Radius * (1.0 + 1e-9)) / R
    val rows = Seq(
      (1L, 10L, 0L, lat0, lon0), (1L, 11L, Dwell, lat0 + dFar, lon0),
      (2L, 20L, 0L, lat0, lon0), (2L, 21L, Dwell + 1L, lat0 + dFar, lon0),
      (3L, 30L, 0L, lat0, lon0), (3L, 31L, Dwell / 2, lat0 + dIn, lon0),
      (3L, 32L, Dwell + 1L, lat0, lon0),
      (4L, 40L, 0L, lat0, lon0), (4L, 41L, Dwell / 2, lat0, lon0),
      (5L, 50L, 0L, lat0, lon0), (5L, 51L, Dwell / 2, lat0 + dOut, lon0),
      (5L, 52L, Dwell + 1L, lat0, lon0))
    val got = run(rows)
    assert(got(10L) === false)
    assert(got(20L) === true)
    assert(got(30L) === true)
    assert(got(40L) === false)
    assert(got(50L) === false)
  }

  test("null-position fixes are dropped, not silently skipped by max()") {
    import spark.implicits._
    val lat0 = math.toRadians(40.0)
    val lon0 = math.toRadians(10.0)
    // track 1: anchor + one null-position fix inside the window + a
    // coverage fix after it; the null row must be EXCLUDED from the
    // output and from the window (n_window = 1, only the far fix)
    val df = Seq(
      (1L, 10L, 0L, Some(lat0), Some(lon0)),
      (1L, 11L, Dwell / 2, None: Option[Double], None: Option[Double]),
      (1L, 12L, Dwell + 1L, Some(lat0), Some(lon0)))
      .toDF("trk", "id", "t", "lat", "lon")
      .withColumn("n", when(col("lat").isNotNull,
        geo.nvec(col("lat"), col("lon"))))
    val out = StayPoints.stayAnchors(df, "trk", "id", "t", "n", Radius, Dwell)
    val rows = out.select("id", "is_stay", "n_window").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(!rows.contains(11L), "null-position fix must not be emitted")
    assert(rows(10L) === ((true, 0L)),
      "anchor window must not count the dropped null-position fix")
  }
}
