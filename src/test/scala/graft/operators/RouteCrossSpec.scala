package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.geo.Gade
import graft.index.{cells, CellKernels}

/** Route-route intersection join: the segsCross predicate against
  * hand-labeled arc topologies, and the cover-candidate machinery
  * against a driver-side ALL-PAIRS sweep of the same kernel (proving
  * the piece covers and shared-level equi-join drop no crossing
  * pair, across piece sizes that force single- and multi-piece
  * segments).
  */
class RouteCrossSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def n(lat: Double, lon: Double): (Double, Double, Double) = {
    val v = Gade.latLonToNvec(math.toRadians(lat), math.toRadians(lon))
    (v.x, v.y, v.z)
  }
  private def kernelCross(a1: (Double, Double, Double), a2: (Double, Double, Double),
                          b1: (Double, Double, Double), b2: (Double, Double, Double)): Boolean =
    CellKernels.segsCross(a1._1, a1._2, a1._3, a2._1, a2._2, a2._3,
      b1._1, b1._2, b1._3, b2._1, b2._2, b2._3)

  test("segsCross decides hand-labeled arc relations") {
    val cases = Seq(
      // X-crossing through the origin region
      ("plus-cross", n(-5, 0), n(5, 0), n(0, -5), n(0, 5), true),
      ("disjoint-parallel", n(0, 0), n(0, 10), n(5, 0), n(5, 10), false),
      // endpoint of one ON the interior of the other (T-touch)
      ("t-touch", n(0, 0), n(0, 10), n(0, 5), n(5, 5), true),
      // shared endpoint only
      ("v-touch", n(0, 0), n(10, 10), n(0, 0), n(-10, 10), true),
      // same great circle (equator), overlapping arcs
      ("coincident-overlap", n(0, 0), n(0, 10), n(0, 5), n(0, 15), true),
      // same great circle, disjoint arcs
      ("coincident-disjoint", n(0, 0), n(0, 10), n(0, 20), n(0, 30), false),
      // crossing far from either arc's span (great circles cross, arcs do not)
      ("circles-cross-arcs-dont", n(-5, 0), n(5, 0), n(10, 60), n(-10, 80), false),
      // degenerate edge (coincident endpoints) never matches
      ("degenerate-a", n(3, 3), n(3, 3), n(0, 0), n(10, 10), false))
    val bad = cases.filter { case (_, a1, a2, b1, b2, want) =>
      kernelCross(a1, a2, b1, b2) != want }
    assert(bad.isEmpty, s"wrong relations: ${bad.map(_._1).mkString(", ")}")
  }

  // deterministic zig-zag routes: id k gets 4 vertices walking east
  // from a key-derived anchor, long enough that small piece sizes
  // split every segment into several pieces
  private def routes(nRoutes: Int): Seq[(Long, Seq[(Double, Double)])] =
    (0 until nRoutes).map { k =>
      val lat0 = -40.0 + 80.0 * SparkTestSession.rnd(k * 7919L + 1)
      val lon0 = -60.0 + 120.0 * SparkTestSession.rnd(k * 104729L + 2)
      val dla = 3.0 + 9.0 * SparkTestSession.rnd(k * 31L + 3)
      val dlo = 4.0 + 10.0 * SparkTestSession.rnd(k * 17L + 4)
      (k.toLong, Seq((lat0 - dla, lon0 - dlo), (lat0 + dla, lon0),
        (lat0 - dla, lon0 + dlo), (lat0 + dla, lon0 + 2 * dlo)))
    }

  private def flatVerts(vs: Seq[(Double, Double)]): Seq[Double] =
    vs.flatMap { case (la, lo) => val v = n(la, lo); Seq(v._1, v._2, v._3) }

  private def bruteCrossPairs(rs: Seq[(Long, Seq[(Double, Double)])]): Set[(Long, Long)] = {
    def segs(vs: Seq[(Double, Double)]) =
      vs.sliding(2).map(p => (n(p(0)._1, p(0)._2), n(p(1)._1, p(1)._2))).toSeq
    (for {
      (ka, va) <- rs; (kb, vb) <- rs if ka < kb
      sa <- segs(va); sb <- segs(vb)
      if kernelCross(sa._1, sa._2, sb._1, sb._2)
    } yield (ka, kb)).toSet
  }

  test("routeIntersectJoin equals the all-pairs kernel sweep across piece sizes") {
    val rs = routes(40)
    val expected = bruteCrossPairs(rs)
    assert(expected.nonEmpty, "fixture produced no crossing pairs")
    assert(expected.size < 40 * 39 / 2, "fixture crosses everything")
    val df = rs.map { case (k, vs) => (k, flatVerts(vs)) }.toDF("r_id", "verts")
    val dfB = df.select(col("r_id").as("b_id"), col("verts").as("b_verts"))
    // 2000 km: one piece per segment; 300 km: several pieces each
    for (pieceM <- Seq(2000e3, 300e3)) {
      val got = SpatialJoins.routeIntersectJoin(df, "r_id", "verts",
          dfB, "b_id", "b_verts", pieceMeters = pieceM)
        .filter(col("r_id") < col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"pieceMeters=$pieceM: missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
    }
  }

  test("orderedPairs self-join equals the symmetric result filtered to a < b") {
    val rs = routes(40)
    val expected = bruteCrossPairs(rs)
    val df = rs.map { case (k, vs) => (k, flatVerts(vs)) }.toDF("r_id", "verts")
    val dfB = df.select(col("r_id").as("b_id"), col("verts").as("b_verts"))
    val got = SpatialJoins.routeIntersectJoin(df, "r_id", "verts",
        dfB, "b_id", "b_verts", pieceMeters = 500e3, orderedPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (a, b) => a < b })
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("either side empty yields the typed empty result") {
    val rs = routes(3)
    val df = rs.map { case (k, vs) => (k, flatVerts(vs)) }.toDF("r_id", "verts")
    val empty = df.filter(col("r_id") < 0)
      .select(col("r_id").as("b_id"), col("verts").as("b_verts"))
    val out = SpatialJoins.routeIntersectJoin(df, "r_id", "verts",
      empty, "b_id", "b_verts")
    assert(out.columns.toSeq == Seq("r_id", "b_id"))
    assert(out.count() == 0L)
  }
}
