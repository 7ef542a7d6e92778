package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.SparkTestSession

/** Spherical polygon excess/area: exact octant value, sign under
  * orientation, fan-root invariance, concave polygons via the
  * tangent-plane shoelace limit, and the array variant's equivalence.
  */
class PolygonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def evalD(c: Column): Double = {
    import spark.implicits._
    Seq(1).toDF("one").select(c.as("v")).collect().head.getDouble(0)
  }

  def vertsOf(pts: Seq[(Double, Double)]): Seq[Column] =
    pts.map { case (la, lo) => geo.nvecDeg(lit(la), lit(lo)) }

  test("octant triangle is exactly pi/2 steradians, ccw positive") {
    val tri = vertsOf(Seq((0.0, 0.0), (0.0, 90.0), (90.0, 0.0)))
    assert(math.abs(evalD(geo.polygonExcess(tri)) - math.Pi / 2) < 1e-15)
    assert(math.abs(evalD(geo.polygonExcess(tri.reverse)) + math.Pi / 2) < 1e-15)
  }

  test("tiny polygons approach the tangent-plane shoelace area (convex and concave)") {
    // L-shaped (concave) hexagon, 1e-3-rad scale, at several centers
    val shape = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0))
    val shoelace = { // planar, in units of (1e-3 rad)^2 -> 3.0 for this L
      val n = shape.length
      math.abs((0 until n).map { i =>
        val (x1, y1) = shape(i); val (x2, y2) = shape((i + 1) % n)
        x1 * y2 - x2 * y1
      }.sum / 2.0)
    }
    for ((cla, clo) <- Seq((0.0, 0.0), (45.0, 100.0), (-60.0, -170.0))) {
      val s = 1e-3
      val verts = shape.map { case (x, y) =>
        // local tangent offsets: x east, y north (degrees via small-angle)
        val la = cla + math.toDegrees(y * s)
        val lo = clo + math.toDegrees(x * s) / math.cos(math.toRadians(cla))
        (la, lo)
      }
      val got = math.abs(evalD(geo.polygonExcess(vertsOf(verts))))
      // off-equator centers: the naive tangent mapping itself distorts
      // first-order in (extent * tan(lat)) ~ 2e-3, so only the equator
      // center isolates the excess formula at 1e-4
      val tol = if (cla == 0.0) 1e-4 else 5e-3
      assert(math.abs(got - shoelace * s * s) / (shoelace * s * s) < tol,
        s"center ($cla,$clo): got $got want ~${shoelace * s * s}")
    }
  }

  test("fan-root invariance: rotating the vertex list preserves the excess") {
    val pts = Seq((10.0, 20.0), (12.0, 25.0), (15.0, 24.0), (16.0, 19.0), (12.0, 17.0))
    val base = evalD(geo.polygonExcess(vertsOf(pts)))
    for (r <- 1 until pts.length) {
      val rot = pts.drop(r) ++ pts.take(r)
      assert(math.abs(evalD(geo.polygonExcess(vertsOf(rot))) - base) < 1e-12, s"rot $r")
    }
  }

  test("null vertex array propagates null, never a zero area") {
    val nullArr = lit(null).cast("array<struct<x:double,y:double,z:double>>")
    val row = Seq(1).map(Tuple1(_))
    import spark.implicits._
    val got = row.toDF("one")
      .select(geo.polygonExcessArr(nullArr).as("e"), geo.polygonAreaArr(nullArr).as("a"))
      .collect().head
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("array variant equals fixed-arity variant; degenerate arities give 0") {
    import spark.implicits._
    val pts = Seq((10.0, 20.0), (12.0, 25.0), (15.0, 24.0), (16.0, 19.0), (12.0, 17.0))
    val fixed = evalD(geo.polygonExcess(vertsOf(pts)))
    val arr = array(vertsOf(pts): _*)
    assert(math.abs(evalD(geo.polygonExcessArr(arr)) - fixed) < 1e-15)
    assert(evalD(geo.polygonExcessArr(array(vertsOf(pts.take(2)): _*))) === 0.0)
    val areaF = evalD(geo.polygonArea(vertsOf(pts)))
    val areaA = evalD(geo.polygonAreaArr(arr))
    assert(math.abs(areaF - areaA) < 1e-6 && areaF > 0)
  }

  test("antimeridian-straddling polygon has the same area as its rotated twin") {
    // same quad shifted in longitude so one copy straddles lon=180
    def quad(lo0: Double) = Seq(
      (-5.0, lo0 - 5.0), (-5.0, lo0 + 5.0), (5.0, lo0 + 5.0), (5.0, lo0 - 5.0))
    val a0 = evalD(geo.polygonExcess(vertsOf(quad(0.0))))
    val a180 = evalD(geo.polygonExcess(vertsOf(quad(180.0))))
    assert(math.abs(a0 - a180) < 1e-12)
  }
}
