package graft.geo.api

import graft.geo._
import graft.geo.{Ellipsoids => Ell}
import math.{toDegrees, toRadians}

/** Object-oriented facade mirroring the reference library's OO surface
  * (reference: src/envector/objects.py — GeoPoint, Nvector,
  * Pvector/ECEFvector, GeoPath, frames E/N/L/B). Thin wrappers over
  * the scalar kernels; binary operations assert frame compatibility
  * like the reference's `_check_frames` (objects.py:2607-2630).
  */
final case class FrameE(ellipsoid: Ellipsoid = Ell.WGS84) {
  def a: Double = ellipsoid.a
  def f: Double = ellipsoid.f

  def GeoPointDeg(latDeg: Double, lonDeg: Double, z: Double = 0.0): GeoPoint =
    GeoPoint(toRadians(latDeg), toRadians(lonDeg), z, this)
  def GeoPointRad(lat: Double, lon: Double, z: Double = 0.0): GeoPoint =
    GeoPoint(lat, lon, z, this)
  def nvector(n: Vec3, z: Double = 0.0): Nvector = Nvector(VecMath.unit(n), z, this)

  /** Karney inverse with depth-adjusted radius a1 = a - z
    * (objects.py:2209).
    */
  def inverse(a1: GeoPoint, b: GeoPoint): (Double, Double, Double) = {
    val z = (a1.z + b.z) / 2
    Karney(a - z, f).inverse(a1.lat, a1.lon, b.lat, b.lon)
  }

  def direct(p: GeoPoint, distance: Double, azimuth: Double,
             longUnroll: Boolean = false): (GeoPoint, Double) = {
    val (lat2, lon2, az2) = Karney(a - p.z, f).direct(p.lat, p.lon, distance, azimuth, longUnroll)
    (GeoPoint(lat2, lon2, p.z, this), az2)
  }
}

object FrameE {
  def apply(name: String): FrameE = FrameE(Ell(name))
  val WGS84: FrameE = FrameE(Ell.WGS84)
}

private[api] object Frames {
  def check(a: FrameE, b: FrameE): Unit =
    require(a == b, s"frame mismatch: $a vs $b")

  /** Validated method dispatch: true for "greatcircle", false for
    * "ellipsoid"; anything else (typos like "exact", "gc") errors
    * instead of silently picking a branch.
    */
  def isGreatCircle(method: String): Boolean = method match {
    case "greatcircle" => true
    case "ellipsoid" => false
    case other => throw new IllegalArgumentException(
      s"unknown method '$other' (expected 'greatcircle' or 'ellipsoid')")
  }
}

/** Geodetic position (radians, depth z = -height). */
final case class GeoPoint(lat: Double, lon: Double, z: Double = 0.0,
                          frame: FrameE = FrameE.WGS84) {
  def latDeg: Double = toDegrees(lat)
  def lonDeg: Double = toDegrees(lon)

  def toNvector: Nvector = Nvector(Gade.latLonToNvec(lat, lon), z, frame)
  def toECEF: ECEFvector =
    ECEFvector(Gade.nvecToPvec(Gade.latLonToNvec(lat, lon), z, frame.a, frame.f), frame)

  /** (distance, azimuth1, azimuth2); method "ellipsoid" (Karney) or
    * "greatcircle" (radius = mean ECEF length, objects.py:722-729).
    */
  def distanceAndAzimuth(other: GeoPoint, method: String = "ellipsoid"): (Double, Double, Double) = {
    Frames.check(frame, other.frame)
    if (Frames.isGreatCircle(method)) {
      val nA = Gade.latLonToNvec(lat, lon); val nB = Gade.latLonToNvec(other.lat, other.lon)
      val radius = (toECEF.p.norm + other.toECEF.p.norm) / 2
      val d = Gade.greatCircleDistanceRad(nA, nB) * radius
      val az1 = Gade.azimuth(nA, nB, frame.a, frame.f)
      val az2raw = Gade.azimuth(nB, nA, frame.a, frame.f)
      val az2 = VecMath.normalizeAngle(az2raw + math.Pi)
      (d, az1, az2)
    } else frame.inverse(this, other)
  }

  /** Destination point; method as above (gc via sphere reckon with
    * radius = |p_EA|, objects.py:552-559).
    */
  def displace(distance: Double, azimuth: Double, method: String = "ellipsoid"): (GeoPoint, Double) =
    if (Frames.isGreatCircle(method)) {
      val radius = toECEF.p.norm
      val nB = Gade.sphereReckon(Gade.latLonToNvec(lat, lon), distance / radius, azimuth)
      val (la, lo) = Gade.nvecToLatLon(nB)
      val p2 = GeoPoint(la, lo, z, frame)
      val azBack = Gade.azimuth(nB, Gade.latLonToNvec(lat, lon), frame.a, frame.f)
      (p2, VecMath.normalizeAngle(azBack + math.Pi))
    } else frame.direct(this, distance, azimuth)

  def deltaTo(other: GeoPoint): Delta = {
    Frames.check(frame, other.frame)
    val nA = Gade.latLonToNvec(lat, lon)
    val nB = Gade.latLonToNvec(other.lat, other.lon)
    Delta(Gade.deltaN(nA, nB, z, other.z, frame.a, frame.f))
  }
}

/** Delta vector decomposed in a local (NED or wander) frame. */
final case class Delta(p: Vec3) {
  def north: Double = p.x
  def east: Double = p.y
  def down: Double = p.z
  def length: Double = p.norm
  /** Bearing about the down axis (objects.py Pvector.azimuth). */
  def azimuth: Double = math.atan2(p.y, p.x)
  def azimuthDeg: Double = toDegrees(azimuth)
  def elevation: Double = math.asin(p.z / p.norm)
}

object Delta {
  /** Delta A->B decomposed in the wander-azimuth frame L of A
    * (objects.py:140-164 delta_L).
    */
  def deltaL(a: GeoPoint, b: GeoPoint, wanderAzimuth: Double): Delta = {
    Frames.check(a.frame, b.frame)
    val nA = Gade.latLonToNvec(a.lat, a.lon)
    val nB = Gade.latLonToNvec(b.lat, b.lon)
    val dE = Gade.deltaE(nA, nB, a.z, b.z, a.frame.a, a.frame.f)
    val rEL = Rot.nEAndWa2REL(nA, wanderAzimuth)
    Delta(rEL.tmv(dE))
  }
}

/** Unit-normal position with depth. */
final case class Nvector(n: Vec3, z: Double = 0.0, frame: FrameE = FrameE.WGS84) {
  def toGeoPoint: GeoPoint = {
    val (lat, lon) = Gade.nvecToLatLon(n)
    GeoPoint(lat, lon, z, frame)
  }
  def toECEF: ECEFvector = ECEFvector(Gade.nvecToPvec(n, z, frame.a, frame.f), frame)
  def +(o: Nvector): Nvector = { Frames.check(frame, o.frame); Nvector(VecMath.unit(n + o.n), (z + o.z) / 2, frame) }
  def unary_- : Nvector = Nvector(-n, z, frame)
}

object Nvector {
  /** unit-mean normal + arithmetic mean depth (objects.py:1075-1084). */
  def mean(ns: Seq[Nvector]): Nvector = {
    require(ns.nonEmpty)
    ns.tail.foreach(o => Frames.check(ns.head.frame, o.frame))
    Nvector(Gade.meanHorizontalPosition(ns.map(_.n)),
      ns.map(_.z).sum / ns.size, ns.head.frame)
  }

  /** Interpolate a time-series of positions at times `tI` — the OO
    * mapping of reference Nvector.interpolate (objects.py:874-948):
    * depth z rides along as a 4th interpolated row (NOT renormalized),
    * the normal is renormalized to unit after interpolation, and
    * out-of-span times yield NaN. kind: "linear" or "cubic"
    * (not-a-knot, = scipy interp1d); optional Savitzky-Golay
    * pre-smoothing via windowLength > 0.
    */
  def interpolate(tI: Array[Double], t: Array[Double], ns: Seq[Nvector],
                  kind: String = "linear", windowLength: Int = 0,
                  polyorder: Int = 2, mode: String = "interp"): Seq[Nvector] = {
    require(ns.nonEmpty && ns.length == t.length)
    ns.tail.foreach(o => Frames.check(ns.head.frame, o.frame))
    val rows = Array(ns.map(_.n.x).toArray, ns.map(_.n.y).toArray,
      ns.map(_.n.z).toArray, ns.map(_.z).toArray)
    val itp = graft.operators.Tracks.interpVectors(tI, t, rows, kind,
      windowLength, polyorder, mode)
    tI.indices.map { i =>
      val u = VecMath.unit(Vec3(itp(0)(i), itp(1)(i), itp(2)(i)),
        zeroFill = Double.NaN)
      Nvector(u, itp(3)(i), ns.head.frame)
    }
  }
}

/** Cartesian ECEF position [m]. */
final case class ECEFvector(p: Vec3, frame: FrameE = FrameE.WGS84) {
  def +(o: ECEFvector): ECEFvector = { Frames.check(frame, o.frame); ECEFvector(p + o.p, frame) }
  def -(o: ECEFvector): ECEFvector = { Frames.check(frame, o.frame); ECEFvector(p - o.p, frame) }
  def length: Double = p.norm
  def toNvector: Nvector = {
    val (n, z) = Gade.pvecToNvec(p, frame.a, frame.f)
    Nvector(n, z, frame)
  }
  def toGeoPoint: GeoPoint = toNvector.toGeoPoint
}

/** Great-circle path between two positions. */
final case class GeoPath(a: GeoPoint, b: GeoPoint) {
  Frames.check(a.frame, b.frame)
  private def nA = Gade.latLonToNvec(a.lat, a.lon)
  private def nB = Gade.latLonToNvec(b.lat, b.lon)
  private def meanRadius: Double = (a.toECEF.length + b.toECEF.length) / 2

  /** Path distance; reference dispatch (objects.py:1726-1733):
    * prefixes "ex"/"el" (exact/ellipsoidal) -> Karney inverse, "eu"
    * -> euclidean chord, anything else -> great circle. The previous
    * one-character dispatch sent "ellipsoid"/"exact" down the
    * euclidean branch silently.
    */
  def trackDistance(method: String = "greatcircle"): Double =
    method.take(2) match {
      case "ex" | "el" => a.frame.inverse(a, b)._1
      case "eu" => Gade.euclideanDistance(nA, nB, meanRadius)
      case _ => Gade.greatCircleDistance(nA, nB, meanRadius)
    }

  /** Cross-track distance; the reference supports ONLY 'greatcircle'
    * and 'euclidean' here (no ellipsoidal variant exists for
    * cross-track, core.py:1011) and dispatches on the first letter
    * (core.py:1036) — so, mirroring it, "ellipsoid"/"exact" land on
    * the euclidean branch. That is reference parity, not an
    * oversight; see [[trackDistance]] for the method that does have
    * an ellipsoidal option.
    */
  def crossTrackDistance(point: GeoPoint, method: String = "greatcircle"): Double =
    Gade.crossTrackDistance(nA, nB, Gade.latLonToNvec(point.lat, point.lon),
      greatCircle = method.head.toLower != 'e', meanRadius)

  def intersect(other: GeoPath): GeoPoint = {
    val c = Gade.intersect(nA, nB,
      Gade.latLonToNvec(other.a.lat, other.a.lon),
      Gade.latLonToNvec(other.b.lat, other.b.lon))
    val (lat, lon) = Gade.nvecToLatLon(c)
    GeoPoint(lat, lon, (a.z + b.z + other.a.z + other.b.z) / 4, a.frame)
  }

  /** Is `point` on this path? method "greatcircle" (default): segment
    * test on the great circle; "ellipsoid": the reference's
    * `_on_ellipsoid_path` (objects.py:1772-1802) — same mean depth,
    * dist_AC <= dist_AB, and the A->C azimuth matching A->B (or C
    * coincident with A), under symmetric rtol/atol closeness.
    */
  def onPath(point: GeoPoint, method: String = "greatcircle",
             rtol: Double = 1e-6, atol: Double = 1e-8): Boolean =
    if (!Frames.isGreatCircle(method)) {
      val z = (a.z + b.z) * 0.5
      val (distAb, azAb, _) = a.distanceAndAzimuth(b)
      val (distAc, azAc, _) = a.distanceAndAzimuth(point)
      def close(x: Double, y: Double): Boolean =
        math.abs(x - y) <= atol + rtol * math.max(math.abs(x), math.abs(y))
      // azimuth agreement on the normalized DIFFERENCE — a deliberate
      // robustness divergence from the reference, whose plain
      // isclose(az_ac, az_ab) (objects.py:1802) rejects on-path points
      // of due-south paths when atan2 jitters between +pi and -pi
      val azClose =
        math.abs(VecMath.normalizeAngle(azAc - azAb)) <=
          atol + rtol * math.max(math.abs(azAc), math.abs(azAb))
      close(z, point.z) &&
        (close(distAc, 0.0) || (distAb >= distAc && azClose))
    } else
      Gade.onGreatCirclePath(nA, nB, Gade.latLonToNvec(point.lat, point.lon),
        meanRadius, atol)

  def interpolate(ti: Double): GeoPoint = {
    val n = Gade.interpolate(nA, nB, ti)
    val (lat, lon) = Gade.nvecToLatLon(n)
    GeoPoint(lat, lon, a.z + ti * (b.z - a.z), a.frame)
  }

  /** Closest point clamped to the segment (objects.py:1991-2062). */
  def closestPointOnPath(point: GeoPoint): GeoPoint = {
    val nP = Gade.latLonToNvec(point.lat, point.lon)
    val proj = Gade.closestPointOnGreatCircle(nA, nB, nP)
    if (Gade.onGreatCirclePath(nA, nB, proj, meanRadius, atol = 1e-6)) {
      val (lat, lon) = Gade.nvecToLatLon(proj)
      GeoPoint(lat, lon, a.z, a.frame)
    } else {
      val dA = Gade.greatCircleDistanceRad(nP, nA)
      val dB = Gade.greatCircleDistanceRad(nP, nB)
      if (dA <= dB) a else b
    }
  }
}

/** North-East-Down frame at a position (Gade Table 2). */
final case class FrameN(point: GeoPoint) {
  def rotation: Mat3 = Gade.nvecToREN(Gade.latLonToNvec(point.lat, point.lon))
}

/** Wander-azimuth frame at a position. */
final case class FrameL(point: GeoPoint, wanderAzimuth: Double = 0.0) {
  def rotation: Mat3 =
    Rot.nEAndWa2REL(Gade.latLonToNvec(point.lat, point.lon), wanderAzimuth)
}

/** Body frame (yaw/pitch/roll relative to NED of the position). */
final case class FrameB(position: Nvector, yaw: Double, pitch: Double, roll: Double) {
  def rotation: Mat3 =
    Gade.nvecToREN(position.n).mm(Rot.zyx2R(yaw, pitch, roll))
}
