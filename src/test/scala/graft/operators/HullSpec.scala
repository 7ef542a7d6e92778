package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Gade, Vec3}

/** Spherical convex hull vs the independent O(n^3) vertex
  * characterization (exists j such that every k lies on one closed
  * side of the great circle through i and j) — a completely
  * different formulation than the kernel's gnomonic monotone chain.
  */
class HullSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refHull(pts: Seq[(Long, Vec3)]): Set[Long] = {
    if (pts.length <= 2) return pts.map(_._1).toSet
    def det(a: Vec3, b: Vec3, c: Vec3): Double = (a cross b) dot c
    pts.collect { case (i, pi)
      if pts.exists { case (j, pj) =>
        j != i && {
          // k == i / k == j are mathematically on the circle; their
          // dets float to ~±1e-17 and must not poison the side test
          val side = pts.collect { case (k, pk) if k != i && k != j =>
            det(pi, pj, pk) }
          side.forall(_ >= 0) || side.forall(_ <= 0)
        }
      } => i
    }.toSet
  }

  private def mkDf(groups: Seq[(Int, Seq[(Long, Double, Double)])]) =
    groups.flatMap { case (g, pts) => pts.map(p => (g, p._1, p._2, p._3)) }
      .toDF("g", "id", "lat", "lon")
      .select(col("g"), col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))

  test("hull ids equal the independent characterization on scattered clusters") {
    // irrational sin/cos scatter: a lat/lon LATTICE creates
    // near-collinear gnomonic triples where the chain and the det
    // characterization disagree at FP noise — not a real input class
    val groups = (0 until 4).map { g =>
      val pts = (0 until 40).map { i =>
        val lat = 25.0 + g * 5 + 12.0 * math.sin(i * 1.7 + g * 0.9)
        val lon = -20.0 + g * 10 + 16.0 * math.cos(i * 2.3 + g * 1.3)
        (i.toLong, lat, lon)
      }
      (g, pts)
    }
    val got = Hull.convexHull(mkDf(groups), "g", "id", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    groups.foreach { case (g, pts) =>
      val want = refHull(pts.map { case (i, la, lo) =>
        (i, Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))) })
      assert(got(g) == want,
        s"group $g: got ${got(g).toSeq.sorted} want ${want.toSeq.sorted}")
      assert(want.size < pts.length, s"group $g: hull must exclude interior points")
    }
  }

  test("tiny groups pass through; non-hemispheric groups fail loudly") {
    val ok = mkDf(Seq((1, Seq((7L, 10.0, 10.0))), (2, Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0)))))
    val got = Hull.convexHull(ok, "g", "id", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 7L), (2, 1L), (2, 2L)))
    val bad = mkDf(Seq((9, Seq((1L, 0.0, 0.0), (2L, 0.0, 178.0), (3L, 0.0, -178.0), (4L, 80.0, 0.0)))))
    val e = intercept[org.apache.spark.SparkException] {
      Hull.convexHull(bad, "g", "id", "n").collect()
    }
    assert(e.getMessage.contains("hemispheric") ||
      Option(e.getCause).exists(_.getMessage.contains("hemispheric")))
  }

  test("exact duplicate positions: hull-vertex dups all emitted, interior dups never") {
    // triangle + interior position carried by TWO ids + a duplicated
    // corner: the old chain stalled on adjacent duplicates (cross
    // identically 0 defeats the strictly-negative pop) and leaked
    // the interior pair
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 10.0), (3L, 10.0, 5.0),
      (4L, 3.0, 5.0), (5L, 3.0, 5.0),   // interior duplicate pair
      (6L, 10.0, 5.0))                   // duplicate of corner 3
    val got = Hull.convexHull(mkDf(Seq((1, pts))), "g", "id", "n")
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 3L, 6L), s"got $got")
  }

  test("collinear boundary points are kept as hull vertices") {
    // three points on the equator segment + one north: the middle
    // equator point lies ON the hull edge and must be reported
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 10.0), (3L, 0.0, 20.0), (4L, 15.0, 10.0))
    val got = Hull.convexHull(mkDf(Seq((1, pts))), "g", "id", "n")
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }
}
