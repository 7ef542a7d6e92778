package graft.geo

import math.{sin, cos, atan2, asin, sqrt, abs, signum}
import VecMath._

/** Scalar n-vector geodesy kernels after Gade (2010), "A Nonsingular
  * Horizontal Position Representation", J. Navigation 63(3).
  *
  * Convention: n-vectors and p-vectors are decomposed in the standard
  * ECEF frame — x-axis through (lat 0, lon 0), y through (0, +90E),
  * z through the North pole. This equals the reference library's
  * default output frame (its axes='e' rotation applied to Gade eq. 3;
  * reference: src/envector/core.py:58-115, rotation.py:30-91).
  *
  * All angles in radians, distances in meters, depth z = -height.
  */
object Gade {
  import Ellipsoids.{WGS84, MeanEarthRadius}

  /** Gade eq (3): lat/lon -> n-vector (core.py:58-115). */
  def latLonToNvec(lat: Double, lon: Double): Vec3 = {
    val cl = cos(lat)
    Vec3(cl * cos(lon), cl * sin(lon), sin(lat))
  }

  /** Gade eqs (5),(6): n-vector -> (lat, lon); robust atan2 forms
    * (rotation.py:430-471).
    */
  def nvecToLatLon(n: Vec3): (Double, Double) = {
    val lat = atan2(n.z, sqrt(n.x * n.x + n.y * n.y))
    val lon = atan2(n.y, n.x)
    (lat, lon)
  }

  /** Gade eq (22): n-vector + depth -> ECEF position [m], exact
    * ellipsoidal (core.py:119-196).
    */
  def nvecToPvec(nRaw: Vec3, depth: Double = 0.0,
                 a: Double = WGS84.a, f: Double = WGS84.f): Vec3 = {
    val n = unit(nRaw) // reference re-normalizes on the way in
    val b = a * (1.0 - f)
    val om = 1.0 - f
    val d = sqrt(n.z * n.z + (n.x * n.x + n.y * n.y) / (om * om))
    val s = b / d
    // surface point minus depth along the normal
    Vec3(s * n.x / (om * om) - n.x * depth,
         s * n.y / (om * om) - n.y * depth,
         s * n.z - n.z * depth)
  }

  /** k of Gade eq (23) (closed-form quartic root, core.py:199-214). */
  private def computeK(a: Double, e2: Double, q: Double, ryz2: Double): Double = {
    val p = ryz2 / (a * a)
    val r = (p + q - e2 * e2) / 6.0
    val s = e2 * e2 * p * q / (4.0 * r * r * r)
    val t = nthroot(1.0 + s + sqrt(s * (2.0 + s)), 3)
    val u = r * (1.0 + t + 1.0 / t)
    val v = sqrt(u * u + e2 * e2 * q)
    val w = e2 * (u + v - q) / (2.0 * v)
    sqrt(u + v + w * w) - w
  }

  /** Gade eq (23): ECEF position [m] -> (n-vector, depth)
    * (core.py:238-305).
    */
  def pvecToNvec(p: Vec3, a: Double = WGS84.a, f: Double = WGS84.f): (Vec3, Double) = {
    val e2 = f * (2.0 - f)
    val ryz2 = p.x * p.x + p.y * p.y // equatorial-plane component^2
    val rx2 = p.z * p.z              // polar component^2
    val q = (1.0 - e2) / (a * a) * rx2
    val ryz = sqrt(ryz2)
    val k = computeK(a, e2, q, ryz2)
    val d = k * ryz / (k + e2)
    val temp0 = sqrt(d * d + rx2)
    val height = (k + e2 - 1.0) / k * temp0
    val xScale = 1.0 / temp0
    val yzScale = xScale * k / (k + e2)
    val n = unit(Vec3(yzScale * p.x, yzScale * p.y, xScale * p.z))
    (n, -height)
  }

  /** Gade §5.4 function 1: exact delta A->B decomposed in E
    * (core.py:309-373).
    */
  def deltaE(nA: Vec3, nB: Vec3, zA: Double = 0, zB: Double = 0,
             a: Double = WGS84.a, f: Double = WGS84.f): Vec3 =
    nvecToPvec(nB, zB, a, f) - nvecToPvec(nA, zA, a, f)

  /** NED direction-cosine matrix columns (north, east, down) at n;
    * pole fallback east=(0,1,0) (rotation.py:511-564, Gade eq 9).
    */
  def nvecToREN(nRaw: Vec3): Mat3 = {
    val n = unit(nRaw)
    val down = -n
    val eastDir = Vec3(0, 0, 1) cross n // perpendicular to spin axis & n
    val east = if (eastDir.norm == 0.0) Vec3(0, 1, 0) else unit(eastDir)
    val north = east cross down
    Mat3(north, east, down)
  }

  /** Delta A->B decomposed in NED of A (core.py:377-449). */
  def deltaN(nA: Vec3, nB: Vec3, zA: Double = 0, zB: Double = 0,
             a: Double = WGS84.a, f: Double = WGS84.f): Vec3 =
    nvecToREN(nA).tmv(deltaE(nA, nB, zA, zB, a, f))

  /** Gade §5.4 function 2: position B from A + delta in E
    * (core.py:453-514).
    */
  def destinationE(nA: Vec3, pAB: Vec3, zA: Double = 0,
                   a: Double = WGS84.a, f: Double = WGS84.f): (Vec3, Double) =
    pvecToNvec(nvecToPvec(nA, zA, a, f) + pAB, a, f)

  /** Position B from A + delta decomposed in NED of A (core.py:518-583). */
  def destinationN(nA: Vec3, pABn: Vec3, zA: Double = 0,
                   a: Double = WGS84.a, f: Double = WGS84.f): (Vec3, Double) =
    destinationE(nA, nvecToREN(nA).mv(pABn), zA, a, f)

  /** Gade eq (16): great-circle angle, well-conditioned at all angles
    * (core.py:1208-1255).
    */
  def greatCircleDistanceRad(nA: Vec3, nB: Vec3): Double =
    atan2((nA cross nB).norm, nA dot nB)

  def greatCircleDistance(nA: Vec3, nB: Vec3, radius: Double = MeanEarthRadius): Double =
    greatCircleDistanceRad(nA, nB) * radius

  /** Chord distance through the sphere (core.py:1399-1431). */
  def euclideanDistance(nA: Vec3, nB: Vec3, radius: Double = MeanEarthRadius): Double =
    (nB - nA).norm * radius

  /** Initial bearing A->B relative North, ellipsoid-exact via the NED
    * delta (core.py:1434-1479).
    */
  def azimuth(nA: Vec3, nB: Vec3, a: Double = WGS84.a, f: Double = WGS84.f): Double = {
    val d = deltaN(nA, nB, 0, 0, a, f)
    atan2(d.y, d.x)
  }

  /** Forward and reverse spherical azimuths from lat/lon
    * (core.py:1181-1205). NOTE the az2 convention: the reference
    * returns the azimuth FROM B BACK TO A (sin_az2 = -cos_b1*sin_w),
    * which differs by pi from the forward-azimuth-at-B convention
    * Karney.sphereDistanceRad uses internally — pick by convention,
    * not by whichever function is handy.
    */
  def azimuthSphere(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double) = {
    val w = lon2 - lon1
    val cb1 = cos(lat1); val sb1 = sin(lat1)
    val cb2 = cos(lat2); val sb2 = sin(lat2)
    val cw = cos(w); val sw = sin(w)
    val az1 = atan2(cb2 * sw, cb1 * sb2 - sb1 * cb2 * cw)
    val az2 = atan2(-cb1 * sw, cb2 * sb1 - sb2 * cb1 * cw)
    (az1, az2)
  }

  /** Spherical direct problem: B from (A, arc distance [rad], azimuth)
    * (core.py:1483-1536).
    */
  def sphereReckon(nA: Vec3, distanceRad: Double, az: Double): Vec3 = {
    val east = unit(Vec3(0, 0, 1) cross nA) // x-hat fallback at poles
    val north = nA cross east
    val d = north * cos(az) + east * sin(az)
    nA * cos(distanceRad) + d * sin(distanceRad)
  }

  /** unit normal of the great circle through A,B; NaN if degenerate
    * (core.py:953-976).
    */
  def greatCircleNormal(nA: Vec3, nB: Vec3): Vec3 =
    unit(nA cross nB, zeroFill = Double.NaN)

  /** Signed cross-track distance from point B to the great circle of
    * (a1,a2); greatCircle=false gives the Euclidean (chord) variant
    * (core.py:996-1038).
    */
  def crossTrackDistance(a1: Vec3, a2: Vec3, nB: Vec3,
                         greatCircle: Boolean = true,
                         radius: Double = MeanEarthRadius): Double = {
    val c = greatCircleNormal(a1, a2)
    val sinTheta = -(c dot nB)
    if (greatCircle) asin(sinTheta) * radius else sinTheta * radius
  }

  /** True if B lies on the great circle through (a1,a2) within atol [m]
    * (core.py:1042-1085).
    */
  def onGreatCircle(a1: Vec3, a2: Vec3, nB: Vec3,
                    radius: Double = MeanEarthRadius, atol: Double = 1e-8): Boolean =
    abs(crossTrackDistance(a1, a2, nB, greatCircle = true, radius)) <= atol

  /** True if B is on the great circle AND between the endpoints
    * (chord-ratio test, core.py:1089-1136).
    */
  def onGreatCirclePath(a1: Vec3, a2: Vec3, nB: Vec3,
                        radius: Double = MeanEarthRadius, atol: Double = 1e-8): Boolean = {
    val scale = (a2 - a1).norm
    val t1 = (nB - a1).norm / scale
    val t2 = (nB - a2).norm / scale
    t1 <= 1 && t2 <= 1 && onGreatCircle(a1, a2, nB, radius, atol)
  }

  /** Closest point C on the great circle of (a1,a2) to B
    * (core.py:1140-1178).
    */
  def closestPointOnGreatCircle(a1: Vec3, a2: Vec3, nB: Vec3): Vec3 = {
    val c = greatCircleNormal(a1, a2)
    val c2 = nB cross c
    val n = unit(c cross c2)
    n * signum(n dot nB)
  }

  /** Linear blend + renormalize along the path; ti in [0,1], midpoint
    * at 0.5 (core.py:744-774).
    */
  def interpolate(a1: Vec3, a2: Vec3, ti: Double): Vec3 =
    unit(a1 + (a2 - a1) * ti, zeroFill = Double.NaN)

  /** Great-circle intersection of paths (a1,a2) and (b1,b2); the
    * solution nearer a1 is selected; NaN when the circles coincide
    * (core.py:778-822).
    */
  def intersect(a1: Vec3, a2: Vec3, b1: Vec3, b2: Vec3): Vec3 = {
    val c = unit((a1 cross a2) cross (b1 cross b2), zeroFill = Double.NaN)
    c * signum(c dot a1)
  }

  /** unit(sum of n-vectors) — the horizontal mean position
    * (core.py:1540-1564).
    */
  def meanHorizontalPosition(ns: Iterable[Vec3]): Vec3 = {
    var sx = 0.0; var sy = 0.0; var sz = 0.0
    ns.foreach { n => sx += n.x; sy += n.y; sz += n.z }
    unit(Vec3(sx, sy, sz))
  }

  /** Per-fix course over ground: azimuths between midpoint-smoothed
    * consecutive n-vectors (core.py:837-950, no Savitzky-Golay).
    * Input: time-ordered track; output has the same length (the last
    * heading is repeated as in the reference's n+1-point scheme).
    */
  def courseOverGround(track: IndexedSeq[Vec3],
                       a: Double = WGS84.a, f: Double = WGS84.f): IndexedSeq[Double] = {
    val n = track.length
    if (n < 2) return IndexedSeq.fill(n)(Double.NaN)
    // reference pads: [v0, mid(v0,v1), ..., mid(vn-2,vn-1), vn-1]
    val padded = new Array[Vec3](n + 1)
    padded(0) = track(0)
    var i = 0
    while (i < n - 1) { padded(i + 1) = unit(track(i) + track(i + 1)); i += 1 }
    padded(n) = track(n - 1)
    (0 until n).map(j => azimuth(padded(j), padded(j + 1), a, f))
  }
}
