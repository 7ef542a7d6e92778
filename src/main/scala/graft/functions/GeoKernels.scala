package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import graft.geo.Karney

/** Static entry points for Catalyst `StaticInvoke` codegen. Each method
  * is a pure function over doubles so generated code calls it directly
  * inside whole-stage codegen (no iterator breaks, no boxing beyond the
  * struct returns).
  *
  * Keep this an object WITHOUT a companion class so scalac emits static
  * forwarders that `StaticInvoke` can target.
  */
object GeoKernels {
  /** Karney inverse: ellipsoidal surface distance [m]. */
  def geodesicDistance(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
                       a: Double, f: Double): Double =
    Karney(a, f).inverse(lat1, lon1, lat2, lon2)._1

  /** Karney inverse: (s12, az1, az2). */
  def geodesicInverse(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
                      a: Double, f: Double): InternalRow = {
    val (s, az1, az2) = Karney(a, f).inverse(lat1, lon1, lat2, lon2)
    new GenericInternalRow(Array[Any](s, az1, az2))
  }

  /** Karney direct: (lat2, lon2, az2). */
  def geodesicReckon(lat1: Double, lon1: Double, distance: Double, azimuth: Double,
                     a: Double, f: Double): InternalRow = {
    val (lat2, lon2, az2) = Karney(a, f).direct(lat1, lon1, distance, azimuth)
    new GenericInternalRow(Array[Any](lat2, lon2, az2))
  }

  /** Ellipsoid-exact initial bearing between two n-vectors (single
    * static call — use from plans where the composed Column form would
    * bloat the expression tree).
    */
  def azimuth(fx: Double, fy: Double, fz: Double,
              tx: Double, ty: Double, tz: Double,
              a: Double, f: Double): Double =
    graft.geo.Gade.azimuth(graft.geo.Vec3(fx, fy, fz), graft.geo.Vec3(tx, ty, tz), a, f)

  /** Gade eq (23) exact ECEF -> (nvec, depth) with the Newton-polished
    * cube root (matches the scalar kernel bit-for-bit).
    */
  def pvecToNvec(px: Double, py: Double, pz: Double, a: Double, f: Double): InternalRow = {
    val (n, depth) = graft.geo.Gade.pvecToNvec(graft.geo.Vec3(px, py, pz), a, f)
    new GenericInternalRow(Array[Any](n.x, n.y, n.z, depth))
  }

  /** Exact great-circle top-k of one point against a small literal
    * landmark set: scan `flat` (x,y,z triples) once, keep the k best
    * by (distance, id) — the metric is the same eq-16
    * `atan2(|n1 x n2|, n1.n2) * radius` as `geo.gcDistance`, ties
    * broken by id like the kNN join's rank window. Returns
    * array<struct<lm_id, dist_m>> already rank-ordered.
    *
    * The landmark arrays ride as PLAN LITERALS (like the IVF
    * centroids), so the operator is stateless and shuffle-free: it
    * runs unchanged over batch frames and `readStream` micro-batches,
    * which is what makes it the streaming kNN path — per-row map-side
    * work only, no rank window (unsupported on streams), no state.
    */
  def knnLandmarks(px: Double, py: Double, pz: Double,
                   ids: org.apache.spark.sql.catalyst.util.ArrayData,
                   flat: org.apache.spark.sql.catalyst.util.ArrayData,
                   k: Int, radius: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = ids.numElements()
    val keep = math.min(k, n)
    // public codegen entry point: guard k <= 0 here too (the Column
    // wrapper validates, but a direct StaticInvoke with k=0 would
    // read bestD(-1) inside generated code)
    if (keep <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val bestD = new Array[Double](keep)
    val bestId = new Array[Long](keep)
    var filled = 0
    var i = 0
    while (i < n) {
      val lx = flat.getDouble(3 * i); val ly = flat.getDouble(3 * i + 1)
      val lz = flat.getDouble(3 * i + 2)
      val cx = py * lz - pz * ly; val cy = pz * lx - px * lz; val cz = px * ly - py * lx
      val d = math.atan2(math.sqrt(cx * cx + cy * cy + cz * cz),
        px * lx + py * ly + pz * lz) * radius
      val id = ids.getLong(i)
      // insertion into the sorted top-k (k is small; branch-light)
      if (filled < keep || d < bestD(filled - 1) ||
          (d == bestD(filled - 1) && id < bestId(filled - 1))) {
        var j = math.min(filled, keep - 1)
        while (j > 0 && (bestD(j - 1) > d || (bestD(j - 1) == d && bestId(j - 1) > id))) {
          bestD(j) = bestD(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestD(j) = d; bestId(j) = id
        if (filled < keep) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = new GenericInternalRow(Array[Any](bestId(i), bestD(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** True when the (lat1,lon1)->(lat2,lon2) inverse problem lies in
    * the GENERAL-POSITION region where [[graft.geo.Karney.inverse]]
    * provably takes the Newton + hybrid path: not meridional /
    * equatorial / short / nearly antipodal, each with a >= 1e6-ULP
    * margin over the solver's own branch thresholds. Formula-for-
    * formula identical (same double operation order) to the
    * `inv_base` WHERE of `Karney.inverseSqlMirror`, so Spark and the
    * DuckDB oracle classify every realistic row identically. One
    * static call: the equivalent Column chain blows up exponentially
    * when Catalyst's project collapsing re-inlines the when() stages
    * (measured 8-16 s at sf0.1 vs ~0.3 s for this kernel).
    */
  def inverseGeneralPosition(lat1: Double, lon1: Double,
                             lat2: Double, lon2: Double, f: Double): Boolean = {
    import graft.geo.VecMath.{normalizeAngle, truncateSmall}
    import math.{abs, atan, atan2, cos, sin, sqrt, tan}
    val e2 = f * (2.0 - f)
    val blat1r = truncateSmall(atan((1.0 - f) * tan(lat1)))
    val blat2r = truncateSmall(atan((1.0 - f) * tan(lat2)))
    val swap = abs(blat1r) < abs(blat2r)
    val bb1 = if (swap) blat2r else blat1r
    val bb2 = if (swap) blat1r else blat2r
    val b1 = if (bb1 > 0) -bb1 else bb1
    val b2 = if (bb1 > 0) -bb2 else bb2
    val lamRaw = truncateSmall(normalizeAngle(lon2 - lon1))
    val lam = if (lamRaw < 0) -lamRaw else lamRaw
    val cbm = (cos(b1) + Karney.TINY + (cos(b2) + Karney.TINY)) * 0.5
    val wbar = sqrt(1.0 - e2 * cbm * cbm)
    val w12 = lam / wbar
    val cw = cos(w12)
    val sinA1s = cos(b2) * sin(w12)
    val cosA1s = cos(b1) * sin(b2) - sin(b1) * cos(b2) * cw
    val sigma12 = atan2(sqrt(sinA1s * sinA1s + cosA1s * cosA1s),
      sin(b1) * sin(b2) + cos(b1) * cos(b2) * cw)
    abs(sin(lam)) > 1e-6 &&
      !(abs(b2 - b1) <= 1e-6 && abs(b1) <= 1e-6) &&
      wbar * sigma12 >= 1e-3 &&
      sigma12 <= math.Pi * (1.0 - 6.0 * abs(f))
  }
}
