package graft.geo

import math.{sin, cos, atan2, sqrt, abs, signum}
import VecMath._

/** Euler-angle <-> rotation-matrix kernels (Gade 2010 Table 2; reference
  * src/envector/rotation.py:94-427). Matrices are direction-cosine
  * matrices R_AB with v_A = R_AB * v_B.
  */
object Rot {
  def fromRows(r0: (Double, Double, Double), r1: (Double, Double, Double),
               r2: (Double, Double, Double)): Mat3 =
    Mat3(Vec3(r0._1, r1._1, r2._1), Vec3(r0._2, r1._2, r2._2), Vec3(r0._3, r1._3, r2._3))

  /** Intrinsic x-y-z Euler angles -> DCM (rotation.py:285-342). */
  def xyz2R(x: Double, y: Double, z: Double): Mat3 = {
    val sx = sin(x); val sy = sin(y); val sz = sin(z)
    val cx = cos(x); val cy = cos(y); val cz = cos(z)
    fromRows(
      (cy * cz, -cy * sz, sy),
      (sy * sx * cz + cx * sz, -sy * sx * sz + cx * cz, -cy * sx),
      (-sy * cx * cz + sx * sz, sy * cx * sz + sx * cz, cy * cx))
  }

  /** Intrinsic z-y-x (yaw-pitch-roll) Euler angles -> DCM
    * (rotation.py:345-427).
    */
  def zyx2R(z: Double, y: Double, x: Double): Mat3 = {
    val sx = sin(x); val sy = sin(y); val sz = sin(z)
    val cx = cos(x); val cy = cos(y); val cz = cos(z)
    fromRows(
      (cz * cy, -sz * cx + cz * sy * sx, sz * sx + cz * sy * cx),
      (sz * cy, cz * cx + sz * sy * sx, -cz * sx + sz * sy * cx),
      (-sy, cy * sx, cy * cx))
  }

  /** DCM -> intrinsic x-y-z Euler angles; singularity-safe cos(y) from
    * four elements (rotation.py:94-157).
    */
  def r2xyz(r: Mat3): (Double, Double, Double) = {
    val cosY = sqrt((r(0, 0) * r(0, 0) + r(0, 1) * r(0, 1)
      + r(1, 2) * r(1, 2) + r(2, 2) * r(2, 2)) / 2.0)
    val sinY = r(0, 2)
    if (cosY > 10 * Eps) {
      (atan2(-r(1, 2), r(2, 2)), atan2(sinY, cosY), atan2(-r(0, 1), r(0, 0)))
    } else {
      // gimbal lock: choose x = 0, y = +-pi/2
      (0.0, signum(sinY) * math.Pi / 2, atan2(r(1, 0), r(1, 1)))
    }
  }

  /** DCM -> intrinsic z-y-x Euler angles (rotation.py:160-203). */
  def r2zyx(r: Mat3): (Double, Double, Double) = {
    val (x, y, z) = r2xyz(r.t)
    (-z, -y, -x)
  }

  /** R_EN from n-vector: columns (north, east, down); see Gade eq (9). */
  def nE2REN(n: Vec3): Mat3 = Gade.nvecToREN(n)

  /** n-vector = minus the last column of R_EN / R_EL (Gade §5.5). */
  def rEN2nE(r: Mat3): Vec3 = -r.c2

  /** R_EL from n-vector + wander azimuth: x-y-z Euler angles
    * (lon, -lat, wander) composed in the reference's 'e' axes then
    * re-expressed in the standard ECEF frame (rotation.py:567-607).
    */
  def nEAndWa2REL(n: Vec3, wanderAzimuth: Double): Mat3 = {
    val (lat, lon) = Gade.nvecToLatLon(n)
    val rel = xyz2R(lon, -lat, wanderAzimuth)
    // R_Ee('e').T row-permutes: (a,b,c)_e -> (-c, b, a)_ECEF
    fromRows(
      (-rel(2, 0), -rel(2, 1), -rel(2, 2)),
      (rel(1, 0), rel(1, 1), rel(1, 2)),
      (rel(0, 0), rel(0, 1), rel(0, 2)))
  }
}
