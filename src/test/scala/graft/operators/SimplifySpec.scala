package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Gade, Vec3, VecMath}

/** Douglas-Peucker simplification — engine keep-set vs an
  * independently-written recursive reference (different distance
  * formulation: asin of the projection onto the great-circle normal,
  * vs the kernel's atan2 foot-point form), plus the DP deviation
  * invariant on the output polyline and degenerate-input contracts.
  */
class SimplifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent arc distance: project p off the great-circle plane
    * (asin |p.c|) when the foot lies between a and b (checked via
    * angles along the arc), else min endpoint distance.
    */
  private def refSegDist(p: Vec3, a: Vec3, b: Vec3): Double = {
    val cRaw = a cross b
    val cn = math.sqrt(cRaw dot cRaw)
    def gc(u: Vec3, v: Vec3): Double = Gade.greatCircleDistanceRad(u, v)
    if (cn < 1e-15) return gc(p, a)
    val c = cRaw * (1.0 / cn)
    val xt = math.asin(math.max(-1.0, math.min(1.0, p dot c)))
    // foot of p on the circle
    val f = VecMath.unit(p - c * (p dot c))
    val ab = gc(a, b)
    val af = gc(a, f)
    val fb = gc(f, b)
    if (math.abs(af + fb - ab) < 1e-9) math.abs(xt)
    else math.min(gc(p, a), gc(p, b))
  }

  /** Straight recursive DP over (ord, nvec), strict > tol split. */
  private def refDp(pts: IndexedSeq[(Long, Vec3)], tol: Double): Set[Long] = {
    if (pts.length <= 2) return pts.map(_._1).toSet
    val keep = scala.collection.mutable.Set(pts.head._1, pts.last._1)
    def go(lo: Int, hi: Int): Unit = if (hi - lo > 1) {
      var best = -1.0; var bi = -1
      var j = lo + 1
      while (j < hi) {
        val d = refSegDist(pts(j)._2, pts(lo)._2, pts(hi)._2)
        if (d > best) { best = d; bi = j }
        j += 1
      }
      if (best > tol) { keep += pts(bi)._1; go(lo, bi); go(bi, hi) }
    }
    go(0, pts.length - 1)
    keep.toSet
  }

  /** Deterministic wiggly track i: a drifting path with sinusoidal
    * lateral noise so DP has real work to do.
    */
  private def track(tid: Int, n: Int): IndexedSeq[(Long, Vec3)] =
    (0 until n).map { j =>
      val lat = 10.0 + tid * 5.0 + j * 0.01 + 0.2 * math.sin(j * 0.7 + tid)
      val lon = -30.0 + j * 0.02 + 0.15 * math.cos(j * 1.1 + tid * 2)
      (j.toLong, Gade.latLonToNvec(math.toRadians(lat), math.toRadians(lon)))
    }

  private def toDf(ts: Seq[(Int, IndexedSeq[(Long, Vec3)])]) =
    ts.flatMap { case (tid, pts) =>
      pts.map { case (o, v) => (tid, o, v.x, v.y, v.z) }
    }.toDF("tid", "ord", "x", "y", "z")
      .select(col("tid"), col("ord"), geo.vec(col("x"), col("y"), col("z")).as("n"))

  test("keep-set matches the independent recursive reference, several tolerances") {
    val tracks = (0 until 5).map(t => (t, track(t, 200)))
    val df = toDf(tracks)
    for (tolM <- Seq(50.0, 500.0, 5000.0)) {
      val tol = tolM / graft.geo.Ellipsoids.MeanEarthRadius
      val got = Simplify.douglasPeucker(df, "tid", "ord", "n", tol)
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      tracks.foreach { case (tid, pts) =>
        val want = refDp(pts, tol)
        assert(got(tid) == want,
          s"track $tid tol=$tolM m: got=${got(tid).size} want=${want.size} " +
            s"diff=${(got(tid) diff want) ++ (want diff got(tid))}")
      }
    }
  }

  test("DP invariant: every dropped point within tol of the simplified polyline") {
    val pts = track(9, 300)
    val df = toDf(Seq((9, pts)))
    val tol = 10000.0 / graft.geo.Ellipsoids.MeanEarthRadius
    val kept = Simplify.douglasPeucker(df, "tid", "ord", "n", tol)
      .collect().map(_.getLong(1)).sorted
    assert(kept.head == 0L && kept.last == 299L, "endpoints must be kept")
    val byOrd = pts.toMap
    kept.sliding(2).foreach { case Array(lo, hi) =>
      ((lo + 1) until hi).foreach { o =>
        val d = refSegDist(byOrd(o), byOrd(lo), byOrd(hi))
        assert(d <= tol + 1e-12, s"dropped point $o deviates $d > $tol")
      }
    }
    // and it actually simplified (10 km tol vs the ~22 km wiggle)
    assert(kept.length < 200, s"tol 10 km kept ${kept.length}/300 points")
  }

  test("tiny tracks pass through whole; null ord/nvec rows are dropped") {
    val df = Seq(
      (1, Some(0L), Some((1.0, 0.0, 0.0))),
      (1, Some(1L), Some((0.0, 1.0, 0.0))),
      (2, Some(0L), Some((0.0, 0.0, 1.0))),
      (3, None: Option[Long], Some((1.0, 0.0, 0.0))),
      (3, Some(1L), None: Option[(Double, Double, Double)]),
      (3, Some(2L), Some((1.0, 0.0, 0.0))))
      .map { case (t, o, v) => (t, o, v.map(_._1), v.map(_._2), v.map(_._3)) }
      .toDF("tid", "ord", "x", "y", "z")
      .select(col("tid"), col("ord"),
        when(col("x").isNotNull, geo.vec(col("x"), col("y"), col("z"))).as("n"))
    val got = Simplify.douglasPeucker(df, "tid", "ord", "n", 0.1)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 0L), (1, 1L), (2, 0L), (3, 2L)))
  }

  test("tolerance 0 keeps everything except exactly-collinear interiors") {
    // 5 points on one meridian (collinear arcs) + one off-arc point
    val pts = IndexedSeq(
      (0L, Gade.latLonToNvec(0.0, 0.0)),
      (1L, Gade.latLonToNvec(math.toRadians(1.0), 0.0)),
      (2L, Gade.latLonToNvec(math.toRadians(2.0), 0.0)),
      (3L, Gade.latLonToNvec(math.toRadians(3.0), math.toRadians(0.5))),
      (4L, Gade.latLonToNvec(math.toRadians(4.0), 0.0)))
    val df = toDf(Seq((7, pts)))
    val got = Simplify.douglasPeucker(df, "tid", "ord", "n", 0.0)
      .collect().map(_.getLong(1)).toSet
    // 3 deviates, so it splits; 1 and 2 lie exactly on the 0-4 arc?
    // no — 0..2 are on the meridian but 0-4's chord passes through 3's
    // longitude offset... the reference implementation is the truth:
    assert(got == refDp(pts, 0.0))
    assert(got.contains(3L))
  }
}
