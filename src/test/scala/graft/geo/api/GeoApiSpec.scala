package graft.geo.api

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Vec3, VecMath}

/** OO facade golden tests transcribed from the reference OO suite
  * (tests/test_objects.py): Ex1 via objects, moving-frame delta_N /
  * delta_L ship tracks, round trips, frame checks.
  */
class GeoApiSpec extends AnyFunSuite {
  val wgs84 = FrameE.WGS84

  def close(a: Double, e: Double, atol: Double = 1e-8, rtol: Double = 1e-12): Unit =
    assert(math.abs(a - e) <= atol + rtol * math.abs(e), s"expected $e got $a")

  test("Ex1 via OO objects") {
    val pa = wgs84.GeoPointDeg(1, 2, 3)
    val pb = wgs84.GeoPointDeg(4, 5, 6)
    val d = pa.deltaTo(pb)
    close(d.north, 331730.23478089)
    close(d.east, 332997.87498927)
    close(d.down, 17404.27136194)
    close(d.azimuthDeg, 45.10926324)
  }

  test("GeoPoint -> Nvector -> ECEF -> GeoPoint round trip") {
    val p = wgs84.GeoPointDeg(-33.456, 147.321, 1234.5)
    val back = p.toNvector.toECEF.toGeoPoint
    close(back.latDeg, p.latDeg, atol = 1e-12)
    close(back.lonDeg, p.lonDeg, atol = 1e-12)
    close(back.z, p.z, atol = 1e-6)
  }

  test("distanceAndAzimuth ellipsoid matches Karney; displace round trips") {
    val a = wgs84.GeoPointDeg(59.9139, 10.7522)
    val b = wgs84.GeoPointDeg(40.7128, -74.0060)
    val (s, az1, _) = a.distanceAndAzimuth(b)
    val (b2, _) = a.displace(s, az1)
    close(b2.latDeg, b.latDeg, atol = 1e-9)
    close(b2.lonDeg, b.lonDeg, atol = 1e-9)
    // greatcircle method is close but not equal
    val (sGc, _, _) = a.distanceAndAzimuth(b, "greatcircle")
    assert(math.abs(sGc - s) / s < 0.01)
  }

  test("moving-frame delta_N east track (tests/test_objects.py:294-326)") {
    val pa = wgs84.GeoPointDeg(1, 2, 0)
    val pb = wgs84.GeoPointDeg(1, 2.005, 0)
    val sensor = wgs84.GeoPointDeg(1.0, 2.0025, 0)
    val path = GeoPath(pa, pb)
    val ti = (0 until 8).map(_ / 7.0)
    val ships = ti.map(path.interpolate)
    // headings along the east-running track are ~90 degrees
    ships.init.zip(ships.tail).foreach { case (s0, s1) =>
      close(s0.deltaTo(s1).azimuthDeg, 90, atol = 0, rtol = 1e-4)
    }
    val trueY = Seq(278.2566243359911, 198.7547317612817, 119.25283909376164,
      39.750946370747656, -39.75094637085409, -119.25283909387079,
      -198.75473176137066, -278.2566243360949)
    val deltas = ships.map(_.deltaTo(sensor))
    deltas.zip(trueY).foreach { case (d, y) =>
      close(d.east, y, atol = 1e-6)
      close(d.north, 0, atol = 1e-3)
      close(d.down, 0, atol = 1e-2)
    }
    val az = deltas.map(d => math.round(d.azimuthDeg))
    assert(az.take(4).forall(_ == 90) && az.drop(4).forall(_ == -90))
  }

  test("moving-frame delta_L with wander azimuth pi/2 (tests/test_objects.py:264-292)") {
    val pa = wgs84.GeoPointDeg(1, 2, 0)
    val pb = wgs84.GeoPointDeg(1, 2.005, 0)
    val sensor = wgs84.GeoPointDeg(1.000090437, 2.0025, 0)
    val path = GeoPath(pa, pb)
    val ships = (0 until 8).map(i => path.interpolate(i / 7.0))
    val trueX = Seq(278.2566243359911, 198.7547317612817, 119.25283909376164,
      39.750946370747656, -39.75094637085409, -119.25283909387079,
      -198.75473176137066, -278.2566243360949)
    val deltas = ships.map(s => Delta.deltaL(s, sensor, math.Pi / 2))
    deltas.zip(trueX).foreach { case (d, x) =>
      close(d.p.x, x, atol = 1e-7, rtol = 1e-7) // assert_allclose default rtol
      close(d.p.y, -10, atol = 0, rtol = 1e-3)
      close(d.p.z, 0, atol = 1e-2)
    }
    val az = deltas.map(d => math.round(d.azimuthDeg))
    assert(az == Seq(-2L, -3L, -5L, -14L, -166L, -175L, -177L, -178L))
  }

  test("GeoPath operations") {
    val a = wgs84.GeoPointDeg(5, 10)
    val b = wgs84.GeoPointDeg(10, 10)
    val path = GeoPath(a, b)
    assert(path.trackDistance("greatcircle") > 500e3)
    // reference dispatch (objects.py:1726-1733): ex/el -> Karney,
    // eu -> chord, else great circle — "ellipsoid" must NOT fall into
    // the euclidean branch (both start with 'e')
    val exact = path.a.frame.inverse(path.a, path.b)._1
    assert(path.trackDistance("ellipsoid") == exact)
    assert(path.trackDistance("exact") == exact)
    assert(path.trackDistance("euclidean") < path.trackDistance("greatcircle"))
    assert(math.abs(path.trackDistance("ellipsoid") -
      path.trackDistance("greatcircle")) < 0.01 * exact)
    val mid = path.interpolate(0.5)
    assert(path.onPath(mid))
    assert(!path.onPath(wgs84.GeoPointDeg(20, 10)))
    // closest point clamps to endpoints off-segment
    val beyond = wgs84.GeoPointDeg(12, 10.1)
    assert(path.closestPointOnPath(beyond) == b)
    val inside = wgs84.GeoPointDeg(7, 10.2)
    val c = path.closestPointOnPath(inside)
    close(c.lonDeg, 10.0, atol = 1e-3)
    // Ex9 intersect via paths
    val pathA = GeoPath(wgs84.GeoPointDeg(10, 20), wgs84.GeoPointDeg(30, 40))
    val pathB = GeoPath(wgs84.GeoPointDeg(50, 60), wgs84.GeoPointDeg(70, 80))
    val ix = pathA.intersect(pathB)
    close(ix.latDeg, 40.31864307)
    close(ix.lonDeg, 55.90186788)
  }

  test("ellipsoidal onPath (objects.py:1772-1802 semantics)") {
    val a = wgs84.GeoPointDeg(5, 10)
    val b = wgs84.GeoPointDeg(10, 10)
    val path = GeoPath(a, b)
    // a point displaced along the exact geodesic azimuth, short of B
    val (distAb, azAb, _) = a.distanceAndAzimuth(b)
    val (onSeg, _) = a.displace(distAb * 0.4, azAb)
    assert(path.onPath(onSeg, method = "ellipsoid"))
    // the start point itself (distance 0 branch)
    assert(path.onPath(a, method = "ellipsoid"))
    // beyond B on the same azimuth: dist_AC > dist_AB -> off
    val (past, _) = a.displace(distAb * 1.3, azAb)
    assert(!path.onPath(past, method = "ellipsoid"))
    // right distance, wrong azimuth -> off
    assert(!path.onPath(wgs84.GeoPointDeg(7.5, 10.4), method = "ellipsoid"))
    // depth mismatch -> off (z closeness is part of the test)
    val deep = wgs84.GeoPointRad(onSeg.lat, onSeg.lon, z = 500.0)
    assert(!path.onPath(deep, method = "ellipsoid"))
  }

  test("ellipsoidal onPath survives the +-pi azimuth of due-south paths") {
    // azimuth A->B is ~pi (due south); an on-segment point whose
    // azimuth jitters to ~-pi must still be on the path (the
    // reference's plain isclose comparison fails here)
    val a = wgs84.GeoPointDeg(10, 0)
    val b = wgs84.GeoPointDeg(-10, 0)
    val path = GeoPath(a, b)
    val (distAb, azAb, _) = a.distanceAndAzimuth(b)
    assert(math.abs(math.abs(azAb) - math.Pi) < 1e-9)
    // nudge ~1e-8 deg west: azimuth flips to ~-pi while the
    // normalized difference stays inside atol
    val cWest = wgs84.GeoPointDeg(0.0, -1e-8)
    val (_, azAc, _) = a.distanceAndAzimuth(cWest)
    assert(azAb * azAc < 0, "test premise: azimuth signs differ")
    assert(path.onPath(cWest, method = "ellipsoid"))
    // still rejects genuinely wrong azimuths
    assert(!path.onPath(wgs84.GeoPointDeg(0, 1), method = "ellipsoid"))
  }

  test("Nvector.interpolate carries z as a 4th interpolated row") {
    val t = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val ns = t.map { ti =>
      wgs84.GeoPointDeg(10 + ti, 5 + 2 * ti, z = 7.0 * ti).toNvector
    }.toSeq
    val out = Nvector.interpolate(Array(1.5, 2.5, 5.0), t, ns, kind = "cubic")
    // z linear in t -> reproduced exactly; normals unit
    close(out(0).z, 7.0 * 1.5, atol = 1e-9)
    close(out(1).z, 7.0 * 2.5, atol = 1e-9)
    close(out(0).n.norm, 1.0, atol = 1e-12)
    // out-of-span -> NaN position and z
    assert(out(2).z.isNaN && out(2).n.hasNaN)
    val gp = out(0).toGeoPoint
    assert(gp.latDeg > 11.0 && gp.latDeg < 12.0)
  }

  test("frame checks reject mixed ellipsoids") {
    val wgs72 = FrameE("WGS72")
    val pa = wgs84.GeoPointDeg(1, 2)
    val pb = wgs72.GeoPointDeg(4, 5)
    assertThrows[IllegalArgumentException](pa.deltaTo(pb))
    assertThrows[IllegalArgumentException](GeoPath(pa, pb))
  }

  test("Nvector mean and FrameB rotation") {
    val ns = Seq((90.0, 0.0), (60.0, 10.0), (50.0, -20.0)).map { case (la, lo) =>
      wgs84.GeoPointDeg(la, lo).toNvector
    }
    val m = Nvector.mean(ns)
    close(m.n.x, 0.3841171702926, atol = 1e-14)
    close(m.n.z, 0.9221074857571395, atol = 1e-14)
    // Ex2 via OO: FrameB delta
    val nEB = FrameE(graft.geo.Ellipsoid(6378135.0, 1.0 / 298.26, "WGS 72"))
      .nvector(Vec3(1, 2, 3), -400)
    val rEB = FrameB(nEB, math.toRadians(10), math.toRadians(20), math.toRadians(30)).rotation
    val pBCe = rEB.mv(Vec3(3000, 2000, 100))
    val (nEC, zEC) = graft.geo.Gade.destinationE(nEB.n, pBCe, nEB.z,
      6378135.0, 1.0 / 298.26)
    val (lat, lon) = graft.geo.Gade.nvecToLatLon(nEC)
    close(math.toDegrees(lat), 53.32637826)
    close(math.toDegrees(lon), 63.46812344)
    close(zEC, -406.00719607)
  }
}
