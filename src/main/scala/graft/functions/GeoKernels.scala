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
}
