package graft.geo

/** Minimal 3-vector / 3x3-matrix math for the geodesy kernels.
  *
  * Semantics follow the reference library's numerics (envector):
  * overflow-safe normalization with smallest-normal guard
  * (reference: src/envector/util.py:730-778 `unit`) and Newton-polished
  * integer roots (util.py:621-654 `nthroot`). These guards ARE the
  * semantics — double-precision agreement with the reference test
  * constants depends on them.
  */
final case class Vec3(x: Double, y: Double, z: Double) {
  @inline def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
  @inline def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
  @inline def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
  @inline def unary_- : Vec3 = Vec3(-x, -y, -z)
  @inline def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
  @inline def cross(o: Vec3): Vec3 =
    Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
  @inline def norm: Double = math.sqrt(x * x + y * y + z * z)
  def hasNaN: Boolean = x.isNaN || y.isNaN || z.isNaN
}

/** Column-major-by-column 3x3 matrix: columns c0, c1, c2. */
final case class Mat3(c0: Vec3, c1: Vec3, c2: Vec3) {
  /** Matrix * vector (vector of column weights). */
  @inline def mv(v: Vec3): Vec3 = c0 * v.x + c1 * v.y + c2 * v.z
  /** Transpose(Matrix) * vector = per-column dot products. */
  @inline def tmv(v: Vec3): Vec3 = Vec3(c0 dot v, c1 dot v, c2 dot v)
  def mm(o: Mat3): Mat3 = Mat3(mv(o.c0), mv(o.c1), mv(o.c2))
  def t: Mat3 = Mat3(
    Vec3(c0.x, c1.x, c2.x), Vec3(c0.y, c1.y, c2.y), Vec3(c0.z, c1.z, c2.z))
  // Row accessors (r = row index 0..2, matching R[r][c] math notation).
  def apply(r: Int, c: Int): Double = {
    val col = c match { case 0 => c0; case 1 => c1; case _ => c2 }
    r match { case 0 => col.x; case 1 => col.y; case _ => col.z }
  }
}

object VecMath {
  /** Smallest normal positive double (numpy finfo.smallest_normal). */
  val Tiny: Double = java.lang.Double.MIN_NORMAL
  val Eps: Double = math.ulp(1.0) // 2.220446049250313e-16

  /** Overflow-safe normalization; zero vectors -> (zeroFill, 0, 0).
    * Mirrors reference util.py `unit` (pre-scale by max-abs + tiny).
    */
  def unit(v: Vec3, zeroFill: Double = 1.0): Vec3 = {
    val m = math.max(math.abs(v.x), math.max(math.abs(v.y), math.abs(v.z))) + Tiny
    val ux = v.x / m; val uy = v.y / m; val uz = v.z / m
    val n = math.sqrt(ux * ux + uy * uy + uz * uz)
    if (n == 0.0) Vec3(zeroFill, 0.0 * zeroFill, 0.0 * zeroFill)
    else {
      val d = n + Tiny
      Vec3(ux / d, uy / d, uz / d)
    }
  }

  /** x^(1/n) polished with one Newton step to machine precision. */
  def nthroot(x: Double, n: Int): Double = {
    val y = math.pow(x, 1.0 / n)
    if (x != 0.0 && Eps * math.abs(x) < 1.0 && y != 0.0)
      y - (math.pow(y, n) - x) / (n * math.pow(y, n - 1))
    else y
  }

  /** Normalize angle to range (-pi, pi]. */
  def normalizeAngle(a: Double): Double = {
    if (!java.lang.Double.isFinite(a)) return a
    val twoPi = 2.0 * math.Pi
    val m = ((a + math.Pi) % twoPi + twoPi) % twoPi - math.Pi
    if (m <= -math.Pi) math.Pi else m
  }

  /** Diagnostic mirror of the reference `_nvector_check_length`
    * (util.py:415-450): warn when an n-vector deviates significantly
    * from unit length (abs(norm - 1) > atol), returning the deviation
    * so callers/tests can assert on it. Opt-in only — the kernels
    * renormalize defensively, so this is a wrong-input tripwire, not
    * a hot-path check.
    */
  def nvectorCheckLength(n: Vec3, atol: Double = 0.1): Double = {
    val deviation = math.abs(n.norm - 1.0)
    if (deviation > atol)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"n-vector should have unit length: norm(n_E)~=1 ! Error is: $deviation")
    deviation
  }

  /** Flush values tinier than the representable neighborhood of `small`
    * to zero (round-trip through `small` in floating point).
    */
  def truncateSmall(x: Double, small: Double = 0.06): Double = {
    if (x == 0.0) 0.0
    else if (math.abs(x) < small) small - (small - x)
    else x
  }
}
