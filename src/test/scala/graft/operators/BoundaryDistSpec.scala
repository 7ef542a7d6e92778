package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Gade, Vec3, VecMath}
import graft.operators.SpatialJoins.Aoi

/** Signed AOI boundary distance — kernel vs dense brute-force edge
  * sampling, sign vs the winding test, and the Column-form
  * segmentDistanceRad agreeing with the kernel on single edges.
  */
class BoundaryDistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val box = Seq((-10.0, -20.0), (-10.0, 20.0), (15.0, 20.0), (15.0, -20.0))
  val aoi = Aoi("box", box)

  /** Brute: min gc distance to 5k points per edge (arc-interpolated;
    * sampling error O(step^2) ~ 1.5e-8 rad, below the 1e-7 assert).
    */
  def brute(p: Vec3): Double = {
    val vs = aoi.vertsN
    vs.indices.flatMap { i =>
      val a = vs(i); val b = vs((i + 1) % vs.length)
      (0 to 5000).map { s =>
        val t = s / 5000.0
        val w = Gade.greatCircleDistanceRad(a, b)
        // slerp along the arc
        val q = VecMath.unit(
          (a * (math.sin((1 - t) * w) / math.sin(w))) + (b * (math.sin(t * w) / math.sin(w))))
        Gade.greatCircleDistanceRad(p, q)
      }
    }.min
  }

  val testPts = Seq(
    (1L, 25.0, 0.0),    // due north, foot on the top edge
    (2L, 0.0, 0.0),     // deep inside
    (3L, -10.5, 45.0),  // east of the box, past the arc end -> vertex case
    (4L, 14.0, 19.0),   // inside, near the NE corner
    (5L, -40.0, -60.0), // far outside to the southwest
    (6L, 16.0, 21.0))   // outside, just past the NE corner

  test("kernel signed distance matches brute-force edge sampling; sign matches winding") {
    val df = testPts.toDF("id", "lat", "lon")
      .select(col("id"), col("lat"), col("lon"),
        geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val out = SpatialJoins.aoiBoundaryDistance(df, "n", Seq(aoi), radius = 1.0)
      .select("id", "lat", "lon", "dist_m")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    out.foreach { case (id, la, lo, d) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      val want = brute(p)
      assert(math.abs(math.abs(d) - want) < 1e-7,
        s"point $id: |kernel|=${math.abs(d)} brute=$want")
      val inside = graft.index.CellKernels.pointInPolygon(p.x, p.y, p.z,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(aoi.flatVerts))
      assert((d < 0) == inside, s"point $id: sign ${d} vs inside=$inside")
    }
  }

  test("buffer semantics: dist <= b selects the dilated polygon") {
    // a walk of points crossing the top edge from inside to far out
    val pts = (0 until 60).map(i => (i.toLong, 14.0 + i * 0.2, 1.0))
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val rows = SpatialJoins.aoiBoundaryDistance(df, "n", Seq(aoi))
      .select("id", "dist_m").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    // signed distance must be monotone increasing along the outward walk
    rows.sliding(2).foreach { case Array((i1, d1), (_, d2)) =>
      assert(d2 > d1, s"not monotone at id $i1: $d1 -> $d2")
    }
    // and cross zero exactly where containment flips
    val inside = rows.filter(_._2 < 0).map(_._1).toSet
    assert(inside.nonEmpty && inside.max < 60)
  }

  test("aoiBufferJoin equals brute-force signed-distance filter at several buffers") {
    // deterministic scatter over the globe, dense near the box edges
    val pts = (0 until 4000).map { i =>
      val lat = -88.0 + (i * 73 % 1760) * 0.1
      val lon = -179.0 + (i * 131 % 3580) * 0.1
      (i.toLong, lat, lon)
    }
    val aois = Seq(aoi, Aoi("north", Seq((55.0, -30.0), (55.0, 40.0), (75.0, 40.0), (75.0, -30.0))))
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    def bruteSigned(p: Vec3, a: Aoi): Double =
      graft.index.CellKernels.boundaryDistSigned(p.x, p.y, p.z,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.flatVerts))
    // 100 km (tight cover), 2000 km (wide), 12000 km (cap saturates at pi)
    for (buf <- Seq(100e3, 2000e3, 12000e3)) {
      val got = SpatialJoins.aoiBufferJoin(df, "n", aois, bufferMeters = buf)
        .select("id", "aoi_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (for {
        (id, la, lo) <- pts
        a <- aois
        p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
        if bruteSigned(p, a) * graft.geo.Ellipsoids.MeanEarthRadius <= buf
      } yield (id, a.id)).toSet
      assert(got == want,
        s"buffer $buf: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)} " +
          s"sizes got=${got.size} want=${want.size}")
    }
  }

  test("aoiBufferJoin at buffer 0 matches polygon containment (plus boundary)") {
    val pts = (0 until 1000).map { i =>
      (i.toLong, -30.0 + (i * 37 % 600) * 0.1, -40.0 + (i * 59 % 800) * 0.1)
    }
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val got = SpatialJoins.aoiBufferJoin(df, "n", Seq(aoi), bufferMeters = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      graft.index.CellKernels.boundaryDistSigned(p.x, p.y, p.z,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(aoi.flatVerts)) <= 0.0
    }.map(_._1).toSet
    assert(got == want)
  }

  test("snapToRoutes: nearest route/segment matches brute sampling, foot consistent") {
    import graft.operators.SpatialJoins.Route
    val r1 = Route("alpha", Seq((0.0, 0.0), (10.0, 10.0), (10.0, 25.0), (20.0, 40.0)))
    val r2 = Route("beta", Seq((-30.0, -60.0), (-10.0, -55.0), (5.0, -40.0)))
    val pts = (0 until 120).map { i =>
      (i.toLong, -40.0 + (i * 37 % 800) * 0.1, -80.0 + (i * 53 % 1300) * 0.1)
    }
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val out = SpatialJoins.snapToRoutes(df, "n", Seq(r1, r2), radius = 1.0)
      .select("id", "route_id", "seg", "dist_m", "snap_n").collect()
    val routes = Map("alpha" -> r1, "beta" -> r2)
    def vertsN(r: Route) = r.verts.map { case (la, lo) =>
      Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo)) }
    // brute: dense slerp sampling along every segment of every route
    def bruteNearest(p: Vec3): (String, Int, Double) =
      routes.toSeq.sortBy(_._1).flatMap { case (id, r) =>
        val vs = vertsN(r)
        (0 until vs.length - 1).map { s =>
          val a = vs(s); val b = vs(s + 1)
          val w = Gade.greatCircleDistanceRad(a, b)
          val d = (0 to 4000).map { t =>
            val f = t / 4000.0
            val q = VecMath.unit(a * (math.sin((1 - f) * w) / math.sin(w)) +
              b * (math.sin(f * w) / math.sin(w)))
            Gade.greatCircleDistanceRad(p, q)
          }.min
          (id, s, d)
        }
      }.minBy(t => (t._3, t._1, t._2))
    out.foreach { row =>
      val id = row.getLong(0)
      val p = {
        val (_, la, lo) = pts(id.toInt)
        Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      }
      val (bid, bseg, bdist) = bruteNearest(p)
      assert(row.getString(1) == bid && row.getInt(2) == bseg,
        s"point $id: got (${row.getString(1)},${row.getInt(2)}) want ($bid,$bseg)")
      // 4000-sample slerp resolution bounds the brute error ~2e-7
      assert(math.abs(row.getDouble(3) - bdist) < 1e-6,
        s"point $id: dist ${row.getDouble(3)} vs brute $bdist")
      // foot consistency: gc(p, snap) == dist and snap is unit
      val s = row.getStruct(4)
      val f = Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2))
      assert(math.abs(math.sqrt(f dot f) - 1.0) < 1e-12)
      assert(math.abs(Gade.greatCircleDistanceRad(p, f) - row.getDouble(3)) < 1e-9)
    }
  }

  test("Column segmentDistanceRad agrees with the kernel on single edges") {
    val a = Gade.latLonToNvec(math.toRadians(-10.0), math.toRadians(-20.0))
    val b = Gade.latLonToNvec(math.toRadians(-10.0), math.toRadians(20.0))
    val df = testPts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val colForm = df.select(col("id"),
        geo.segmentDistanceRad(
          geo.vec(lit(a.x), lit(a.y), lit(a.z)),
          geo.vec(lit(b.x), lit(b.y), lit(b.z)), col("n")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    testPts.foreach { case (id, la, lo) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      // kernel on a degenerate 3-vertex polygon a,b,a gives the
      // segment distance (both directed edges are the same arc)
      val verts = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(a.x, a.y, a.z, b.x, b.y, b.z, a.x, a.y, a.z))
      val k = math.abs(graft.index.CellKernels.boundaryDistSigned(p.x, p.y, p.z, verts))
      assert(math.abs(colForm(id) - k) < 1e-12, s"point $id: ${colForm(id)} vs $k")
    }
  }
}
