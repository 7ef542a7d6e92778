package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Ellipsoids, Gade, Vec3, VecMath}
import graft.index.cells

/** Polygon-TABLE joins vs a brute-force reference (every point
  * against every polygon through the same even-odd / signed-distance
  * scalar math, no cover pruning) — proving the per-ring mixed-level
  * circumdisc covers drop no qualifying pair.
  */
class PolygonTableJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val R = Ellipsoids.MeanEarthRadius

  // polygon table spanning three size classes (cover levels must
  // differ) plus holes/multipolygon structure:
  //  - big: a ~45-degree box
  //  - small: a ~1.5-degree box a continent away
  //  - multi: outer box + hole + island-in-hole + disjoint part
  private val big = Seq(Seq((-20.0, -40.0), (-20.0, 5.0), (25.0, 5.0), (25.0, -40.0)))
  private val small = Seq(Seq((40.0, 100.0), (40.0, 101.5), (41.5, 101.5), (41.5, 100.0)))
  private val multi = Seq(
    Seq((30.0, 60.0), (30.0, 90.0), (55.0, 90.0), (55.0, 60.0)),
    Seq((38.0, 68.0), (38.0, 82.0), (48.0, 82.0), (48.0, 68.0)),
    Seq((41.0, 72.0), (41.0, 78.0), (45.0, 78.0), (45.0, 72.0)),
    Seq((-50.0, -120.0), (-50.0, -100.0), (-35.0, -100.0), (-35.0, -120.0)))
  private val polyDefs = Seq("big" -> big, "small" -> small, "multi" -> multi)

  // the production encoding, not a re-implementation — a header/layout
  // change must fail these specs, not silently diverge from them
  private def flatRings(rings: Seq[Seq[(Double, Double)]]): Seq[Double] =
    SpatialJoins.AoiM("spec", rings).flatRings.toSeq

  private def polysDf = (polyDefs.map { case (id, r) => (id, flatRings(r)) } :+
    (("nullrow", null.asInstanceOf[Seq[Double]])))
    .toDF("poly_id", "rings")

  // deterministic scatter biased toward the polygons (plus a band
  // crossing the hole and the island so parity flips are exercised)
  private val pts: Seq[(Long, Double, Double)] = {
    def h(i: Long, s: Long) = ((i * 2654435761L + s) % 2000001L) / 1000000.0 - 1.0
    val global = (0L until 400L).map(i =>
      (i, math.toDegrees(math.asin(h(i, 1))), 180.0 * h(i, 2)))
    val nearBig = (1000L until 1200L).map(i => (i, 2.0 + 50.0 * h(i, 3), -18.0 + 50.0 * h(i, 4)))
    val nearSmall = (2000L until 2200L).map(i => (i, 40.7 + 2.5 * h(i, 5), 100.7 + 2.5 * h(i, 6)))
    val nearMulti = (3000L until 3300L).map(i => (i, 43.0 + 16.0 * h(i, 7), 75.0 + 20.0 * h(i, 8)))
    global ++ nearBig ++ nearSmall ++ nearMulti
  }

  private def refInside(p: Vec3, rings: Seq[Seq[(Double, Double)]]): Boolean =
    rings.count { ring =>
      val vn = ring.map { case (la, lo) =>
        Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo)) }
      // all test rings are convex with q15's orientation: inside =
      // every edge's half-plane (independent of the winding kernel)
      vn.indices.forall { i =>
        val c = vn(i) cross vn((i + 1) % vn.length)
        c.x * p.x + c.y * p.y + c.z * p.z > 0
      }
    } % 2 == 1

  private def refBoundary(p: Vec3, rings: Seq[Seq[(Double, Double)]]): Double = {
    val d = rings.flatMap { ring =>
      val vn = ring.map { case (la, lo) =>
        Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo)) }
      vn.indices.map { i =>
        graft.index.CellKernels.segDistRad(p.x, p.y, p.z,
          vn(i).x, vn(i).y, vn(i).z,
          vn((i + 1) % vn.length).x, vn((i + 1) % vn.length).y,
          vn((i + 1) % vn.length).z)
      }
    }.min
    if (refInside(p, rings)) -d else d
  }

  private def ptsDf = pts.toDF("id", "lat", "lon")
    .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))

  test("polygonJoin equals the all-pairs even-odd reference (mixed sizes, holes, null rings)") {
    val got = SpatialJoins.polygonJoin(ptsDf, "n", "id", polysDf, "poly_id", "rings")
      .select("id", "poly_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (for {
      (i, la, lo) <- pts
      p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      (id, rings) <- polyDefs if refInside(p, rings)
    } yield (i, id)).toSet
    assert(want.nonEmpty && want.exists(_._2 == "small") &&
      want.exists(_._2 == "multi"), s"degenerate fixture: $want")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("polygonBufferJoin equals the all-pairs signed-distance reference") {
    val bufM = 300e3
    val got = SpatialJoins.polygonBufferJoin(ptsDf, "n", "id",
        polysDf, "poly_id", "rings", bufferMeters = bufM, radius = R)
      .select(col("id"), col("poly_id"), round(col("dist_m"), 3).as("d"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(2))).toMap
    val want = (for {
      (i, la, lo) <- pts
      p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      (id, rings) <- polyDefs
      d = refBoundary(p, rings) * R if d <= bufM
    } yield ((i, id), BigDecimal(d) // Spark round() is HALF_UP
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(want.nonEmpty && want.exists(_._1._2 == "small"))
    assert(got == want, {
      val ks = (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k))
      ks.take(5).map(k => s"$k got=${got.get(k)} want=${want.get(k)}").toString
    })
  }

  test("cover levels adapt per polygon size (the mixed-level machinery is exercised)") {
    val lv = polysDf.filter(col("rings").isNotNull)
      .select(col("poly_id"), cells.ringCoverLevels(col("rings"), 0.0).as("l"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(lv("small").min > lv("big").max,
      s"small polygon must cover at a finer level: $lv")
    assert(lv("multi").distinct.length >= 1 && lv.size == 3)
  }

  test("zonalStats equals the per-polygon aggregate of the all-pairs reference") {
    // value derived from the id so the reference can recompute it
    val valued = ptsDf.withColumn("v", (col("id") % 97).cast("double"))
    val got = SpatialJoins.zonalStats(valued, "n", "id", polysDf, "poly_id", "rings",
        Seq(count(lit(1)).as("n_points"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val insidePairs = for {
      (i, la, lo) <- pts
      p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      (id, rings) <- polyDefs if refInside(p, rings)
    } yield (id, i)
    val want = insidePairs.groupBy(_._1).map { case (id, xs) =>
      val ids = xs.map(_._2)
      id -> ((ids.length.toLong, ids.map(i => (i % 97).toDouble).sum, ids.min))
    }
    assert(want.nonEmpty && want.keySet.size >= 2, s"degenerate fixture: $want")
    assert(got == want, s"got=$got want=$want")
  }

  test("nearestPolygon equals the brute region-distance argmin through ladder escalation") {
    // 50 km start: the global-noise points are far from every
    // polygon, so they must survive several escalation rounds and
    // still come out with the exact global argmin
    val got = SpatialJoins.nearestPolygon(ptsDf, "n", "id",
      polysDf, "poly_id", "rings", startMeters = 50e3)
    val gm = got.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    got.unpersist()
    val R = Ellipsoids.MeanEarthRadius
    val want = pts.map { case (i, la, lo) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      val cands = polyDefs.map { case (id, rings) =>
        (math.max(refBoundary(p, rings) * R, 0.0), id) }
      val (d, id) = cands.min
      i -> ((id, d))
    }.toMap
    assert(gm.keySet == want.keySet) // default cap matches every point
    val bad = want.collect { case (k, (id, d))
      if gm(k)._1 != id || math.abs(gm(k)._2 - d) > 1e-6 => (k, gm(k), (id, d)) }
    assert(bad.isEmpty, s"${bad.take(5)}")
    // contained points report region distance exactly 0
    val inside = want.filter(_._2._2 == 0.0).keys
    assert(inside.nonEmpty && inside.forall(k => gm(k)._2 == 0.0))
  }

  // route-TABLE fixture for nearestRoute: three polylines of very
  // different lengths/locations (the global-noise points are far from
  // all of them, forcing several escalation rounds)
  private val routeDefs = Seq(
    "ra" -> Seq((0.0, -30.0), (12.0, -20.0), (20.0, -5.0)),
    "rb" -> Seq((35.0, 65.0), (45.0, 75.0), (50.0, 88.0), (42.0, 95.0)),
    "rc" -> Seq((40.5, 100.2), (41.2, 101.3)))

  private def flatVerts(vs: Seq[(Double, Double)]): Seq[Double] =
    vs.flatMap { case (la, lo) =>
      val v = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      Seq(v.x, v.y, v.z)
    }

  private def routesDf = routeDefs.map { case (id, vs) => (id, flatVerts(vs)) }
    .toDF("route_id", "verts")

  private def refRouteDist(p: Vec3, vs: Seq[(Double, Double)]): Double = {
    val vn = vs.map { case (la, lo) =>
      Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo)) }
    vn.indices.init.map { i =>
      graft.index.CellKernels.segDistRad(p.x, p.y, p.z,
        vn(i).x, vn(i).y, vn(i).z,
        vn(i + 1).x, vn(i + 1).y, vn(i + 1).z)
    }.min
  }

  test("nearestRoute equals the brute segment-distance argmin through ladder escalation") {
    val got = SpatialJoins.nearestRoute(ptsDf, "n", "id",
      routesDf, "route_id", "verts", startMeters = 50e3)
    val gm = got.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    got.unpersist()
    val want = pts.map { case (i, la, lo) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      val (d, id) = routeDefs.map { case (id, vs) =>
        (refRouteDist(p, vs) * R, id) }.min
      i -> ((id, d))
    }.toMap
    assert(gm.keySet == want.keySet) // default cap matches every point
    val bad = want.collect { case (k, (id, d))
      if gm(k)._1 != id || math.abs(gm(k)._2 - d) > 1e-6 => (k, gm(k), (id, d)) }
    assert(bad.isEmpty, s"${bad.take(5)}")
  }

  test("nearestRoute under a cap keeps exactly the points within maxMeters") {
    val cap = 500e3
    val got = SpatialJoins.nearestRoute(ptsDf, "n", "id",
      routesDf, "route_id", "verts", startMeters = 50e3, maxMeters = cap)
    val gm = got.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    got.unpersist()
    val want = pts.flatMap { case (i, la, lo) =>
      val p = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      val (d, id) = routeDefs.map { case (id, vs) =>
        (refRouteDist(p, vs) * R, id) }.min
      if (d <= cap) Some(i -> ((id, d))) else None
    }.toMap
    assert(want.nonEmpty && want.size < pts.size, s"degenerate cap fixture: ${want.size}")
    assert(gm.keySet == want.keySet)
    val bad = want.collect { case (k, (id, d))
      if gm(k)._1 != id || math.abs(gm(k)._2 - d) > 1e-6 => (k, gm(k), (id, d)) }
    assert(bad.isEmpty, s"${bad.take(5)}")
  }

  test("an empty (or all-null-rings) polygon table yields the empty join") {
    val empty = Seq.empty[(String, Seq[Double])].toDF("poly_id", "rings")
    val allNull = Seq(("n1", null.asInstanceOf[Seq[Double]])).toDF("poly_id", "rings")
    for (polys <- Seq(empty, allNull)) {
      val pip = SpatialJoins.polygonJoin(ptsDf, "n", "id", polys, "poly_id", "rings")
      assert(pip.columns.toSet == Set("id", "n", "poly_id"))
      assert(pip.count() == 0L)
      val buf = SpatialJoins.polygonBufferJoin(
        ptsDf, "n", "id", polys, "poly_id", "rings", 50e3)
      assert(buf.columns.toSet == Set("id", "n", "poly_id", "dist_m"))
      assert(buf.count() == 0L)
    }
  }

  test("hemisphere-violating rings throw instead of silently mis-containing") {
    // a ring spanning > 90 deg from its centroid (near-hemispheric)
    val bad = Seq(Seq((-80.0, 0.0), (-80.0, 120.0), (-80.0, -120.0),
      (80.0, -60.0), (80.0, 60.0)))
    val df = Seq(("bad", flatRings(bad))).toDF("poly_id", "rings")
    val ex = intercept[org.apache.spark.SparkException] {
      SpatialJoins.polygonJoin(ptsDf, "n", "id", df, "poly_id", "rings").count()
    }
    assert(ex.getMessage.contains("hemisphere") ||
      Option(ex.getCause).exists(_.getMessage.contains("hemisphere")))
  }
}
