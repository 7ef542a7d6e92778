package graft.geo

import math.{sin, cos, tan, atan, atan2, sqrt, abs, hypot, signum, max, Pi}
import VecMath.{normalizeAngle, truncateSmall, nthroot}

/** Scalar direct + inverse ellipsoidal geodesic solver after
  * C. F. F. Karney, "Algorithms for geodesics", J. Geodesy 87, 43-55
  * (2013) — 6th-order series (eqs 15-25), Newton iteration on alpha1
  * with the reduced-length derivative (eqs 38-39), astroid starting
  * guess for nearly-antipodal pairs (eqs 55-57).
  *
  * Structure mirrors the reference's self-contained solver
  * (reference: src/envector/karney.py) but is a per-point scalar
  * implementation suited to row-wise Catalyst evaluation. Instances are
  * immutable and precompute all ellipsoid-constant series coefficients;
  * obtain via [[Karney.apply]] (cached per (a, f)).
  */
final class Karney private (val a: Double, val f: Double) {
  import Karney._

  val b: Double = a * (1.0 - f)
  val e2: Double = f * (2.0 - f)
  val e2m: Double = e2 / (1.0 - e2) // second eccentricity squared
  val n3: Double = f / (2.0 - f)    // third flattening

  // A3/C3 polynomial coefficients evaluated at n (Karney eqs 24, 25).
  private val a3Coefs: Array[Double] = A3Coefficients.map(polyval(_, n3))
  private val c3Coefs: Array[Array[Double]] =
    C3Coefficients.map(row => row.map(c => polyval(c.init, n3) / c.last))

  /** epsilon from eq (16): k^2 = e'^2 cos^2(alpha0). */
  @inline private def epsilonOf(cosAlpha0: Double): Double = {
    val k2 = e2m * cosAlpha0 * cosAlpha0
    k2 / (math.pow(sqrt(1.0 + k2) + 1.0, 2))
  }

  /** Per-line series state for a given equatorial azimuth. */
  private final class Series(epsi: Double) {
    val eps2 = epsi * epsi
    val a1 = polyval(A1Coefficients, eps2) / (1.0 - epsi) // eq 17
    val c1x = evalCij(C1Coefficients, epsi, squared = true) // eq 18
    lazy val cm1x = evalCij(CM1Coefficients, epsi, squared = true) // eq 21
    val a3 = polyval(a3Coefs, epsi) // eq 24
    val c3x = evalCij(c3Coefs, epsi, squared = false) // eq 25

    def i1(sigma: Double): Double = a1 * (sigma + cosineSum(c1x, sigma))
    def i1inv(sdb: Double): Double = {
      val tau = sdb / a1
      tau + cosineSum(cm1x, tau) // eq 20
    }
    def i3(sigma: Double): Double = a3 * (sigma + cosineSum(c3x, sigma))
    /** J(sigma) = I1(sigma) - I2(sigma); eqs 40-43. */
    def mkJ: Double => Double = {
      val a2 = polyval(A2Coefficients, eps2) * (1.0 - epsi) // eq 42
      val c2x = evalCij(C2Coefficients, epsi, squared = true) // eq 43
      val c1m2 = Array.tabulate(c1x.length)(i => a1 * c1x(i) - a2 * c2x(i))
      val a1m2 = a1 - a2
      (sigma: Double) => a1m2 * sigma + cosineSum(c1m2, sigma)
    }
  }

  /** NEA triangle (Karney eqs 5, 10-12): returns
    * (sigma1, w1, cosAlpha0, sinAlpha0).
    */
  private def triangleNEA(blat1: Double, alpha1: Double): (Double, Double, Double, Double) = {
    val cosA1 = cos(alpha1); val sinA1 = sin(alpha1)
    val cosB1 = cos(blat1) + TINY; val sinB1 = sin(blat1)
    val sinA0 = sinA1 * cosB1                  // eq 5
    val cosA0 = hypot(cosA1, sinA1 * sinB1)    // eq 10
    val sigma1 = atan2(sinB1, cosA1 * cosB1)   // eq 11
    val w1 = atan2(sinA0 * sin(sigma1), cos(sigma1)) // eq 12
    (sigma1, w1, cosA0, sinA0)
  }

  /** NEB triangle, direct problem (eqs 12-14): returns (blat2, w2, alpha2). */
  private def triangleNEBDirect(sigma2: Double, cosA0: Double, sinA0: Double): (Double, Double, Double) = {
    val cosS2 = cos(sigma2); val sinS2 = sin(sigma2)
    val sinB2 = cosA0 * sinS2
    val cosB2 = hypot(cosA0 * cosS2, sinA0)
    val w2 = atan2(sinA0 * sinS2, cosS2)       // eq 12
    val blat2 = atan2(sinB2, cosB2)            // eq 13
    val alpha2 = atan2(sinA0, cosA0 * cosS2)   // eq 14
    (blat2, w2, alpha2)
  }

  /** NEB triangle, inverse problem (eqs 11, 12, 45): returns
    * (sigma2, w2, alpha2). The sign trick forces sigma2 = pi for
    * antipodal equatorial points.
    */
  private def triangleNEB(cosB1: Double, cosB2: Double, sinB2: Double,
                          sinA0: Double, alpha1: Double): (Double, Double, Double) = {
    val sgn = if (sinB2 == 0.0 && cosB1 == 1.0) -1.0 else 1.0
    val cosA1 = cos(alpha1)
    val cosA2cosB2 = sgn * sqrt(cosA1 * cosA1 * cosB1 * cosB1
      + (cosB2 * cosB2 - cosB1 * cosB1))
    val sinA2cosB2 = sin(alpha1) * cosB1
    val alpha2 = atan2(sinA2cosB2, cosA2cosB2)
    val sigma2 = atan2(sinB2, cosA2cosB2)
    val w2raw = atan2(sinA0 * sin(sigma2), cos(sigma2))
    val w2 = signum(sigma2) * abs(w2raw)
    (sigma2, w2, alpha2)
  }

  /** Direct problem: position B and forward azimuth at B from
    * (lat1, lon1, azimuth1, distance s12). Angles in radians.
    */
  def direct(lat1: Double, lon1: Double, distance: Double, azimuth: Double,
             longUnroll: Boolean = false): (Double, Double, Double) = {
    val alpha1 = truncateSmall(azimuth)
    val blat1 = atan((1.0 - f) * tan(truncateSmall(lat1))) // eq 6
    val (sigma1, w1, cosA0, sinA0) = triangleNEA(blat1, alpha1)
    val ser = new Series(epsilonOf(cosA0))
    val s1 = b * ser.i1(sigma1) // eq 7
    val sigma2 = ser.i1inv((s1 + distance) / b) // eq 20
    val (blat2, w2, alpha2) = triangleNEBDirect(sigma2, cosA0, sinA0)
    val lamda12 = w2 - w1 + f * sinA0 * (ser.i3(sigma1) - ser.i3(sigma2)) // eq 8
    val lon2 =
      if (longUnroll) {
        val correction = (sigma2 - atan2(sin(sigma2), cos(sigma2))
          - sigma1 + atan2(sin(sigma1), cos(sigma1)))
        val sgn = if (sinA0 >= 0) 1.0 else -1.0
        lon1 + lamda12 + sgn * correction
      } else normalizeAngle(lon1 + lamda12)
    val lat2 = atan(tan(blat2) / (1.0 - f)) // eq 6 inverse
    (lat2, lon2, alpha2)
  }

  /** ANSI-SQL mirror of [[direct]] (longUnroll = false) for the
    * DuckDB correctness oracle: emits one SELECT chain (nested
    * sub-selects, all series constants inlined as literals evaluated
    * from the SAME arrays the solver uses) that computes
    * (lat2, lon2) from columns (lat1, lon1, dist, azi) of `from`.
    * The only numerical deltas vs the Scala path: Clenshaw summation
    * unrolls to the direct sum of c_i sin(2 i x) terms and hypot
    * becomes sqrt-of-squares — both sub-ulp-of-term differences, so
    * gate queries should round to <= 6 decimals of a degree.
    * Oracle-only plumbing, kept next to the solver so the equation
    * chain and its relational mirror stay in one file.
    */
  // SQL-mirror building blocks shared by directSqlMirror and
  // inverseSqlMirror: shortest-roundtrip double literals, Horner
  // chains, the truncateSmall rounding trick, and the unrolled
  // sum of c_i sin(2 i x) that replaces Clenshaw summation.
  private def L(x: Double): String = {
    val s = x.toString
    if (s.contains('.') || s.contains('E') || s.contains('e')) s else s + ".0"
  }
  private def horner(coefs: Array[Double], x: String): String =
    coefs.tail.foldLeft(L(coefs.head))((acc, c) => s"(($acc) * ($x) + ${L(c)})")
  private def trunc(x: String): String =
    s"CASE WHEN $x = 0 THEN 0 WHEN abs($x) < 0.06 THEN 0.06 - (0.06 - $x) ELSE $x END"
  private def sinSum(prefix: String, n: Int, arg: String): String =
    (1 to n).map(i => s"${prefix}_$i * sin(${2 * i} * $arg)").mkString(" + ")
  /** normalizeAngle (VecMath.scala:68) as SQL; `m` must already hold
    * fmod(fmod(x+pi, 2pi)+2pi, 2pi) - pi from an enclosing select.
    */
  private def normCase(m: String): String =
    s"CASE WHEN $m <= ${L(-Pi)} THEN ${L(Pi)} ELSE $m END"
  private def normMod(x: String): String =
    s"fmod(fmod(($x) + ${L(Pi)}, ${L(2 * Pi)}) + ${L(2 * Pi)}, ${L(2 * Pi)}) - ${L(Pi)}"

  def directSqlMirror(from: String, key: String): String = {
    // eps-power columns and per-row series coefficients
    // left-associated power chains (no same-SELECT alias references)
    val epsPows = (2 to 6).map(l =>
      s"ep$l" -> (2 to l).foldLeft("ep1")((acc, _) => s"($acc * eps)"))
    val c1Cols = C1Coefficients.zipWithIndex.map { case (row, i) =>
      s"c1_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps2")}" }
    val cm1Cols = CM1Coefficients.zipWithIndex.map { case (row, i) =>
      s"cm1_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps2")}" }
    val c3Cols = c3Coefs.zipWithIndex.map { case (row, i) =>
      s"c3_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps")}" }
    s"""SELECT $key,
       | atan(tan(blat2) / ${L(1.0 - f)}) AS lat2,
       | CASE WHEN m <= ${L(-Pi)} THEN ${L(Pi)} ELSE m END AS lon2
       | FROM (SELECT $key, blat2,
       |   fmod(fmod(lon1 + lamda12 + ${L(Pi)}, ${L(2 * Pi)}) + ${L(2 * Pi)}, ${L(2 * Pi)}) - ${L(Pi)} AS m
       |  FROM (SELECT $key, lon1, blat2,
       |    w2 - w1 + ${L(f)} * sinA0 * (a3 * (sigma1 + ${sinSum("c3", 5, "sigma1")})
       |      - a3 * (sigma2 + ${sinSum("c3", 5, "sigma2")})) AS lamda12
       |   FROM (SELECT *,
       |     atan2(sinA0 * sin(sigma2), cos(sigma2)) AS w2,
       |     atan2(cosA0 * sin(sigma2),
       |       sqrt(cosA0 * cos(sigma2) * cosA0 * cos(sigma2) + sinA0 * sinA0)) AS blat2
       |    FROM (SELECT *, tau + ${sinSum("cm1", 6, "tau")} AS sigma2
       |     FROM (SELECT *, ((s1 + dist) / ${L(b)}) / a1 AS tau
       |      FROM (SELECT *, ${L(b)} * a1 * (sigma1 + ${sinSum("c1", 6, "sigma1")}) AS s1
       |       FROM (SELECT *, ${(c1Cols ++ cm1Cols ++ c3Cols)
                 .map { case (n, e) => s"$e AS $n" }.mkString(", ")}
       |        FROM (SELECT *, ${horner(A1Coefficients, "eps2")} / (1.0 - eps) AS a1,
       |          ${horner(a3Coefs, "eps")} AS a3,
       |          ${epsPows.map { case (n, e) => s"$e AS $n" }.mkString(", ")}
       |         FROM (SELECT *, eps * eps AS eps2, eps AS ep1
       |          FROM (SELECT *, k2 / ((sqrt(1.0 + k2) + 1.0) * (sqrt(1.0 + k2) + 1.0)) AS eps
       |           FROM (SELECT *, atan2(sinA0 * sin(sigma1), cos(sigma1)) AS w1,
       |             ${L(e2m)} * cosA0 * cosA0 AS k2
       |            FROM (SELECT *, sinA1 * cosB1 AS sinA0,
       |              sqrt(cosA1 * cosA1 + sinA1 * sinB1 * sinA1 * sinB1) AS cosA0,
       |              atan2(sinB1, cosA1 * cosB1) AS sigma1
       |             FROM (SELECT *, cos(alpha1) AS cosA1, sin(alpha1) AS sinA1,
       |               cos(blat1) + ${L(TINY)} AS cosB1, sin(blat1) AS sinB1
       |              FROM (SELECT $key, lon1, dist,
       |                ${trunc("azi")} AS alpha1,
       |                atan(${L(1.0 - f)} * tan(${trunc("lat1")})) AS blat1
       |               FROM $from))))))))))))))""".stripMargin.replace("\n", " ")
  }

  /** ANSI-SQL mirror of [[inverse]] for GENERAL-POSITION pairs: the
    * Newton iteration on alpha1 (eqs 38-39, table 5) runs as a
    * recursive CTE generated from the SAME coefficient arrays as the
    * solver, preceded by the canonicalization + Vincenty start
    * (table 3 / eqs 48-51) and followed by the hybrid distance
    * (table 6) and azimuth restoration. Rows are FILTERED to the
    * region where [[inverse]] provably takes the Newton + hybrid
    * path, with wide margins so both engines classify identically:
    * not meridional (|sin lam| > 1e-6 vs tol 1e-12), not equatorial,
    * not short (s12 >= a*1e-3 vs a*1e-4), not nearly antipodal
    * (sigma12 <= pi*(1 - 6|f|) vs pi*(1 - 3|f|cos^2 b1)). The gate
    * query must apply the SAME filter on the engine side
    * (SparkEntry.inverseGeneralFilter); excluded branches (astroid,
    * meridional, equatorial, short) keep their golden-value specs.
    * Numerical deltas vs Scala: unrolled Clenshaw, sqrt-of-squares
    * hypot, and independent Newton stopping — all leave the solved
    * alpha1 within ~1e-15, so gates should round s12 to <= 2 dp of a
    * meter and azimuths to <= 8 dp of a radian.
    *
    * `from` must provide columns ($key, lat1, lon1, lat2, lon2)
    * [radians]. Emits a full statement selecting ($key, s12, az1,
    * az2).
    */
  def inverseSqlMirror(from: String, key: String): String = {
    val epsPows = (2 to 6).map(l =>
      s"ep$l" -> (2 to l).foldLeft("ep1")((acc, _) => s"($acc * eps)"))
    def c1Cols(p: String) = C1Coefficients.zipWithIndex.map { case (row, i) =>
      s"${p}_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps2")}" }
    def c2Cols(p: String) = C2Coefficients.zipWithIndex.map { case (row, i) =>
      s"${p}_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps2")}" }
    def c3Cols(p: String) = c3Coefs.zipWithIndex.map { case (row, i) =>
      s"${p}_${i + 1}" -> s"ep${i + 1} * ${horner(row, "eps")}" }
    def cols(cs: Seq[(String, String)]) =
      cs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    // eps ladder: eps -> (eps2, ep1) -> (ep2..ep6 + A-series) -> C-rows
    def seriesLadder(inner: String, withA2A3: Boolean, cRows: String): String = {
      val a = s"${horner(A1Coefficients, "eps2")} / (1.0 - eps) AS a1s" +
        (if (withA2A3)
          s", ${horner(A2Coefficients, "eps2")} * (1.0 - eps) AS a2s, ${horner(a3Coefs, "eps")} AS a3s"
         else "")
      s"""(SELECT *, $cRows
         | FROM (SELECT *, $a, ${cols(epsPows)}
         |  FROM (SELECT *, eps * eps AS eps2, eps AS ep1
         |   FROM (SELECT *, k2 / ((sqrt(1.0 + k2) + 1.0) * (sqrt(1.0 + k2) + 1.0)) AS eps
         |    FROM $inner))))""".stripMargin
    }
    // Newton step: one nested-select chain from (alpha1, dold, it) x
    // per-row constants to the updated state. Structure follows
    // solveAlpha1's newtonStep: triangles NEA/NEB, series, lamda12,
    // reduced length m12 (eq 38), dL/dalpha, Newton update with the
    // NaN half-step fallback and the [0, pi] clamp.
    val newtonInner =
      s"""(SELECT *, ${L(e2m)} * cosA0 * cosA0 AS k2,
         |  atan2(sinA0 * sin(sigma1), cos(sigma1)) AS w1,
         |  atan2(sinA2cb2, cosA2cb2) AS alpha2,
         |  atan2(sinB2n, cosA2cb2) AS sigma2
         | FROM (SELECT *, sinA1 * cosB1t AS sinA0,
         |   sqrt(cosA1 * cosA1 + sinA1 * sinB1t * sinA1 * sinB1t) AS cosA0,
         |   atan2(sinB1t, cosA1 * cosB1t) AS sigma1,
         |   (CASE WHEN sinB2n = 0 AND cosB1n = 1.0 THEN -1.0 ELSE 1.0 END)
         |     * sqrt(greatest(cosA1 * cosA1 * cosB1n * cosB1n
         |         + (cosB2n * cosB2n - cosB1n * cosB1n), 0.0)) AS cosA2cb2,
         |   sinA1 * cosB1n AS sinA2cb2
         |  FROM (SELECT inv_newton.*, inv_base.lam, inv_base.sinB1t, inv_base.cosB1t,
         |    inv_base.sinB1m, inv_base.cosB1n, inv_base.sinB2n, inv_base.cosB2n,
         |    cos(inv_newton.alpha1) AS cosA1, sin(inv_newton.alpha1) AS sinA1
         |   FROM inv_newton JOIN inv_base USING ($key)
         |   WHERE NOT inv_newton.done AND inv_newton.it < 20)))""".stripMargin
    val newtonSeries = seriesLadder(newtonInner, withA2A3 = true,
      cols(c1Cols("c1") ++ c2Cols("c2") ++ c3Cols("c3")) +
        ", sign(sigma2) * abs(atan2(sinA0 * sin(sigma2), cos(sigma2))) AS w2")
    val c1m2 = (1 to 6).map(i => s"cm_$i" -> s"a1s * c1_$i - a2s * c2_$i")
    val newtonStep =
      s"""SELECT $key,
         | CASE WHEN dalpha IS NULL OR isnan(dalpha)
         |   THEN alpha1 - dold * 0.5
         |   ELSE least(${L(Pi)}, greatest(0.0, alpha1 + dalpha)) END AS alpha1,
         | CASE WHEN dalpha IS NULL OR isnan(dalpha)
         |   THEN dold * 0.5 ELSE dalpha END AS dold,
         | it + 1 AS it,
         | coalesce(abs(dl) < 0.000000000001, FALSE) AS done
         | FROM (SELECT *, dl / dLdA AS dalpha
         |  FROM (SELECT *,
         |    CASE WHEN abs(cos(alpha2)) < 1e-15
         |      THEN -sqrt(1.0 - ${L(e2)} * cosB1n * cosB1n) / sinB1m * 2.0
         |      ELSE m12 / ${L(a)} / (cos(alpha2) * cosB2n) END AS dLdA
         |   FROM (SELECT *,
         |     ${L(b)} * (sqrt(1.0 + k2 * sin(sigma2) * sin(sigma2)) * cos(sigma1) * sin(sigma2)
         |       - sqrt(1.0 + k2 * sin(sigma1) * sin(sigma1)) * cos(sigma2) * sin(sigma1)
         |       - cos(sigma1) * cos(sigma2) * deltaJ) AS m12,
         |     lam - (lamda2 - lamda1) AS dl
         |    FROM (SELECT *,
         |      w1 - ${L(f)} * sinA0 * (a3s * (sigma1 + ${sinSum("c3", 5, "sigma1")})) AS lamda1,
         |      w2 - ${L(f)} * sinA0 * (a3s * (sigma2 + ${sinSum("c3", 5, "sigma2")})) AS lamda2,
         |      ((a1s - a2s) * sigma2 + ${sinSum("cm", 6, "sigma2")})
         |        - ((a1s - a2s) * sigma1 + ${sinSum("cm", 6, "sigma1")}) AS deltaJ
         |     FROM (SELECT *, ${cols(c1m2)} FROM $newtonSeries)))))""".stripMargin
    // hybrid: final (s12, alpha2) for the solved alpha1 (table 6);
    // solveHybrid uses the +TINY cosines on BOTH latitudes.
    val hybridInner =
      s"""(SELECT *, ${L(e2m)} * cosA0 * cosA0 AS k2,
         |  atan2(sinA2cb2, cosA2cb2) AS alpha2f,
         |  atan2(sinB2n, cosA2cb2) AS sigma2
         | FROM (SELECT *, sinA1 * cosB1t AS sinA0,
         |   sqrt(cosA1 * cosA1 + sinA1 * sinB1t * sinA1 * sinB1t) AS cosA0,
         |   atan2(sinB1t, cosA1 * cosB1t) AS sigma1,
         |   (CASE WHEN sinB2n = 0 AND cosB1t = 1.0 THEN -1.0 ELSE 1.0 END)
         |     * sqrt(greatest(cosA1 * cosA1 * cosB1t * cosB1t
         |         + (cosB2v * cosB2v - cosB1t * cosB1t), 0.0)) AS cosA2cb2,
         |   sinA1 * cosB1t AS sinA2cb2
         |  FROM (SELECT inv_alpha.$key, inv_alpha.alpha1, inv_base.swap,
         |    inv_base.swapAlpha, inv_base.negLam, inv_base.sinB1t,
         |    inv_base.cosB1t, inv_base.sinB2n, inv_base.cosB2v,
         |    cos(inv_alpha.alpha1) AS cosA1, sin(inv_alpha.alpha1) AS sinA1
         |   FROM inv_alpha JOIN inv_base USING ($key))))""".stripMargin
    val hybridSeries = seriesLadder(hybridInner, withA2A3 = false, cols(c1Cols("c1")))
    s"""WITH RECURSIVE
       | inv_base AS (
       |  SELECT *,
       |    atan2(sinA1s, cosA1s) AS alpha10
       |  FROM (SELECT *,
       |    atan2(sqrt(sinA1s * sinA1s + cosA1s * cosA1s),
       |      sinB1t * sinB2n + cosB1n * cosB2n * cw) AS sigma12
       |   FROM (SELECT *, cosB2n * sw AS sinA1s,
       |     cosB1n * sinB2n - sinB1t * cosB2n * cw AS cosA1s
       |    FROM (SELECT *, sin(w12) AS sw, cos(w12) AS cw
       |     FROM (SELECT *, lam / wbar AS w12
       |      FROM (SELECT *,
       |        sqrt(1.0 - ${L(e2)} * ((cosB1t + cosB2v) * 0.5) * ((cosB1t + cosB2v) * 0.5)) AS wbar
       |       FROM (SELECT *,
       |         sin(b1) AS sinB1t, cos(b1) + ${L(TINY)} AS cosB1t,
       |         sin(b1) - ${L(TINY)} AS sinB1m, cos(b1) AS cosB1n,
       |         sin(b2) AS sinB2n, cos(b2) AS cosB2n, cos(b2) + ${L(TINY)} AS cosB2v
       |        FROM (SELECT *,
       |          CASE WHEN bb1 > 0 THEN -bb1 ELSE bb1 END AS b1,
       |          CASE WHEN bb1 > 0 THEN -bb2 ELSE bb2 END AS b2,
       |          lamRaw < 0 AS negLam,
       |          CASE WHEN lamRaw < 0 THEN -lamRaw ELSE lamRaw END AS lam,
       |          swap <> (bb1 > 0) AS swapAlpha
       |         FROM (SELECT *,
       |           CASE WHEN swap THEN blat2r ELSE blat1r END AS bb1,
       |           CASE WHEN swap THEN blat1r ELSE blat2r END AS bb2,
       |           ${trunc(normCase("lamN"))} AS lamRaw
       |          FROM (SELECT *, abs(blat1r) < abs(blat2r) AS swap,
       |            ${normMod("lon2 - lon1")} AS lamN
       |           FROM (SELECT $key,
       |             ${trunc(s"atan(${L(1.0 - f)} * tan(lat1))")} AS blat1r,
       |             ${trunc(s"atan(${L(1.0 - f)} * tan(lat2))")} AS blat2r,
       |             lon1, lon2
       |            FROM $from))))))))))
       |  WHERE abs(sin(lam)) > 0.000001
       |    AND NOT (abs(b2 - b1) <= 0.000001 AND abs(b1) <= 0.000001)
       |    AND wbar * sigma12 >= 0.001
       |    AND sigma12 <= ${L(Pi * (1.0 - 6.0 * abs(f)))}
       | ),
       | inv_newton AS (
       |  SELECT $key, alpha10 AS alpha1, CAST(0.0 AS DOUBLE) AS dold,
       |    0 AS it, FALSE AS done
       |  FROM inv_base
       |  UNION ALL
       |  $newtonStep
       | ),
       | inv_alpha AS (
       |  SELECT $key, alpha1 FROM (
       |   SELECT $key, alpha1,
       |     row_number() OVER (PARTITION BY $key ORDER BY it DESC) AS rn
       |   FROM inv_newton) WHERE rn = 1
       | )
       | SELECT $key, s12, ${normCase("m1")} AS az1, ${normCase("m2")} AS az2
       | FROM (SELECT $key, s12, ${normMod("az1c")} AS m1, ${normMod("az2c")} AS m2
       |  FROM (SELECT $key, s12,
       |    CASE WHEN negLam THEN -az1b ELSE az1b END AS az1c,
       |    CASE WHEN negLam THEN -az2b ELSE az2b END AS az2c
       |   FROM (SELECT $key, s12, negLam,
       |     CASE WHEN swapAlpha THEN ${L(Pi)} - az1a ELSE az1a END AS az1b,
       |     CASE WHEN swapAlpha THEN ${L(Pi)} - az2a ELSE az2a END AS az2b
       |    FROM (SELECT $key, s12, swapAlpha, negLam,
       |      CASE WHEN swap THEN alpha2f ELSE alpha1 END AS az1a,
       |      CASE WHEN swap THEN alpha1 ELSE alpha2f END AS az2a
       |     FROM (SELECT $key, swap, swapAlpha, negLam, alpha1, alpha2f,
       |       ${L(b)} * abs(
       |         a1s * (sigma2 + ${sinSum("c1", 6, "sigma2")})
       |         - a1s * (sigma1 + ${sinSum("c1", 6, "sigma1")})) AS s12
       |      FROM $hybridSeries)))))""".stripMargin.replace("\n", " ")
  }

  /** Astroid starting azimuth for nearly-antipodal pairs
    * (Karney eqs 55-57, table 4); oblate and prolate branches.
    */
  /** ANSI-SQL mirror of [[inverse]] for MERIDIONAL pairs (lon1 ==
    * lon2 EXACTLY, so lamda12 = 0): the solver sets alpha1 =
    * signum(dblat) * 0 = 0 and runs only the hybrid distance
    * (table 6) along the meridian, where alpha0 = 0 makes epsilon a
    * per-ellipsoid CONSTANT — the I1 integral collapses to a closed
    * form DuckDB evaluates directly (no Newton, no recursion).
    * Azimuths restore to exactly 0 (northward) or pi (southward);
    * the canonicalization (swap to |b1| >= |b2|, negate to b1 <= 0)
    * is mirrored op-for-op because the sigma values feed
    * transcendental functions where argument signs matter at the
    * last ulp. I1's Clenshaw sum is unrolled like the other mirrors
    * (deltas ~1e-15 relative — round s12 to <= 2 dp of a meter).
    *
    * `from` must provide ($key, lat1, lat2) [radians] with
    * 0.01 <= |lat2 - lat1| <= 2.0 — the caller applies that filter
    * on BOTH sides, keeping every row >= 1e6 ULPs clear of the
    * short-distance (s12 < a*1e-4) and nearly-antipodal branch
    * thresholds so the engines classify identically. Emits
    * ($key, s12, az1, az2). Mirrors [[inverse]] lines 515-545 for
    * meridional && !equatorial (reference: karney.py:849-877).
    */
  def meridionalSqlMirror(from: String, key: String): String = {
    // alpha0 = 0 => k2 = e'^2: epsilon, A1 and the C1 rows are plain
    // ellipsoid constants, computed with the solver's own arrays
    val k2 = e2m
    val eps = k2 / math.pow(sqrt(1.0 + k2) + 1.0, 2)
    val a1c = polyval(A1Coefficients, eps * eps) / (1.0 - eps)
    val c1x = evalCij(C1Coefficients, eps, squared = true)
    def i1(sig: String): String =
      s"${L(a1c)} * ($sig + ${c1x.zipWithIndex.map { case (c, i) =>
        s"${L(c)} * sin(${2 * (i + 1)} * $sig)" }.mkString(" + ")})"
    s"""SELECT $key,
       | ${L(b)} * abs((${i1("s2")}) - (${i1("s1")})) AS s12,
       | CASE WHEN lat2 > lat1 THEN 0.0 ELSE ${L(Pi)} END AS az1,
       | CASE WHEN lat2 > lat1 THEN 0.0 ELSE ${L(Pi)} END AS az2
       | FROM (SELECT $key, lat1, lat2,
       |   atan2(sin(b1c), cos(b1c)) AS s1,
       |   atan2(sin(b2c), sqrt(cos(b1c)*cos(b1c) + (cos(b2c)*cos(b2c) - cos(b1c)*cos(b1c)))) AS s2
       |  FROM (SELECT $key, lat1, lat2,
       |    CASE WHEN bs1 > 0 THEN -bs1 ELSE bs1 END AS b1c,
       |    CASE WHEN bs1 > 0 THEN -bs2 ELSE bs2 END AS b2c
       |   FROM (SELECT $key, lat1, lat2,
       |     CASE WHEN abs(b1) >= abs(b2) THEN b1 ELSE b2 END AS bs1,
       |     CASE WHEN abs(b1) >= abs(b2) THEN b2 ELSE b1 END AS bs2
       |    FROM (SELECT $key, lat1, lat2,
       |      ${trunc(s"atan(${L(1.0 - f)} * tan(lat1))")} AS b1,
       |      ${trunc(s"atan(${L(1.0 - f)} * tan(lat2))")} AS b2
       |     FROM $from))))""".stripMargin.replace("\n", " ")
  }

  /** ANSI-SQL mirror of [[inverse]] for EQUATORIAL pairs (lat1 =
    * lat2 = 0 exactly, 0.06 < lamda12 < (1-f)*pi with margin): the
    * solver fixes alpha1 = alpha2 = pi/2 and KEEPS the
    * Vincenty-start distance — neither Newton nor the hybrid stage
    * executes — so s12 = a * wbar * sigma12 with wbar = sqrt(1 - e2)
    * (cbm = 1 at the equator; the TINY guard vanishes in double) and
    * sigma12 = atan2(|sin w12|, cos w12), w12 = lamda12 / wbar: the
    * geodesic runs along the equator itself (s12 ~ a * lamda12).
    * normalizeAngle's fmod chain is mirrored so lamda12 matches the
    * solver's to the last ulp.
    *
    * `from` must provide ($key, lam0) with lam0 = lon2 - lon1 in
    * (0.06, (1-f)*pi - margin]. Emits ($key, s12, az1, az2).
    * Mirrors [[inverse]] lines 503-524 for equatorial pairs
    * (reference: karney.py:855-860).
    */
  def equatorialSqlMirror(from: String, key: String): String = {
    val wbar = sqrt(1.0 - e2)
    // a * wbar pre-multiplied in Scala: matches the solver's
    // left-associated a * wbar * sigma12 bit-for-bit AND keeps DuckDB
    // from overflowing DECIMAL x DECIMAL literal arithmetic
    s"""SELECT $key,
       | ${L(a * wbar)} * atan2(abs(sin(lam / ${L(wbar)})), cos(lam / ${L(wbar)})) AS s12,
       | ${L(Pi / 2)} AS az1, ${L(Pi / 2)} AS az2
       | FROM (SELECT $key, ${normCase("mm")} AS lam
       |  FROM (SELECT $key, ${normMod("lam0")} AS mm FROM $from))""".stripMargin.replace("\n", " ")
  }

  private def solveAstroid(blat1: Double, blat2: Double, lamda12: Double,
                           cosB1: Double): Double = {
    val delta = if (f == 0.0) 1.0 else abs(f * Pi * cosB1 * cosB1)
    val x = (lamda12 - Pi) * cosB1 / delta
    val y = (blat1 + blat2) / delta
    val k = astroidK(x, y)
    if (f < 0) {
      if (y == 0.0) atan2(sqrt(max(1.0 - x * x, 0.0)), -x)
      else atan2(-y, x * k / (1.0 + k))
    } else {
      if (y == 0.0) atan2(-x, sqrt(max(1.0 - x * x, 0.0)))
      else atan2(-x * k / (1.0 + k), y)
    }
  }

  /** Newton iteration on alpha1 (Karney table 5, eqs 38-39). */
  private def solveAlpha1(alpha10: Double, blat1: Double, blat2: Double,
                          trueLamda12: Double): Double = {
    val tol = 1e-15
    val sinB1 = sin(blat1) - TINY; val cosB1 = cos(blat1)
    val sinB2 = sin(blat2); val cosB2 = cos(blat2)

    def newtonStep(alpha1: Double): (Double, Double) = {
      val (sigma1, w1, cosA0, sinA0) = triangleNEA(blat1, alpha1)
      val (sigma2, w2, alpha2) = triangleNEB(cosB1, cosB2, sinB2, sinA0, alpha1)
      val ser = new Series(epsilonOf(cosA0))
      val lamda1 = w1 - f * sinA0 * ser.i3(sigma1)
      val lamda2 = w2 - f * sinA0 * ser.i3(sigma2)
      val lamda12 = lamda2 - lamda1
      val jf = ser.mkJ
      val k2 = e2m * cosA0 * cosA0
      val sinS1 = sin(sigma1); val cosS1 = cos(sigma1)
      val sinS2 = sin(sigma2); val cosS2 = cos(sigma2)
      val kSinS1 = sqrt(1.0 + k2 * sinS1 * sinS1)
      val kSinS2 = sqrt(1.0 + k2 * sinS2 * sinS2)
      val deltaJ = jf(sigma2) - jf(sigma1)
      val m12 = b * (kSinS2 * cosS1 * sinS2
        - kSinS1 * cosS2 * sinS1
        - cosS1 * cosS2 * deltaJ) // eq 38
      val cosA2 = cos(alpha2)
      val dLdA =
        if (abs(cosA2) < tol) -sqrt(1.0 - e2 * cosB1 * cosB1) / sinB1 * 2.0
        else m12 / a / (cosA2 * cosB2)
      val dlamda12 = trueLamda12 - lamda12
      (dlamda12 / dLdA, dlamda12)
    }

    var alpha1 = alpha10
    var dalphaOld = 0.0
    var it = 0
    var done = false
    while (it < 20 && !done) {
      val (dalpha1, dlamda12) = newtonStep(alpha1)
      if (dalpha1.isNaN) {
        dalphaOld *= 0.5
        alpha1 -= dalphaOld
      } else {
        alpha1 = math.min(Pi, math.max(0.0, alpha1 + dalpha1))
        dalphaOld = dalpha1
      }
      if (abs(dlamda12) < 1e-12) done = true
      it += 1
    }
    alpha1
  }

  /** Final distance + azimuth2 for a solved alpha1 (Karney table 6). */
  private def solveHybrid(alpha1: Double, blat1: Double, blat2: Double): (Double, Double) = {
    val cosB1 = cos(blat1) + TINY
    val sinB2 = sin(blat2); val cosB2 = cos(blat2) + TINY
    val (sigma1, _, cosA0, sinA0) = triangleNEA(blat1, alpha1)
    val (sigma2, _, alpha2) = triangleNEB(cosB1, cosB2, sinB2, sinA0, alpha1)
    val ser = new Series(epsilonOf(cosA0))
    val s12 = b * abs(ser.i1(sigma2) - ser.i1(sigma1)) // eq 7
    (s12, alpha2)
  }

  /** Inverse problem: (s12 [m], azimuth1, azimuth2 [rad]) between
    * (lat1, lon1) and (lat2, lon2) [rad].
    */
  def inverse(latA: Double, lonA: Double, latB: Double, lonB: Double): (Double, Double, Double) = {
    // canonical form: blat1 <= 0, blat1 <= blat2 <= -blat1, 0 <= lamda12 <= pi
    val blat1r = truncateSmall(atan((1.0 - f) * tan(latA)))
    val blat2r = truncateSmall(atan((1.0 - f) * tan(latB)))
    val swap = abs(blat1r) < abs(blat2r)
    var blat1 = if (swap) blat2r else blat1r
    var blat2 = if (swap) blat1r else blat2r
    val negate = blat1 > 0
    if (negate) { blat1 = -blat1; blat2 = -blat2 }
    val lamRaw = truncateSmall(normalizeAngle(lonB - lonA))
    val negLam = lamRaw < 0
    val lamda12 = if (negLam) -lamRaw else lamRaw
    val swapAlpha = swap ^ negate

    def restore(a1: Double, a2: Double): (Double, Double) = {
      var az1 = if (swap) a2 else a1
      var az2 = if (swap) a1 else a2
      if (swapAlpha) { az1 = Pi - az1; az2 = Pi - az2 }
      if (negLam) { az1 = -az1; az2 = -az2 }
      (normalizeAngle(az1), normalizeAngle(az2))
    }

    val cosB1 = cos(blat1) + TINY
    val sinB2 = sin(blat2); val cosB2 = cos(blat2) + TINY

    // Vincenty-style first guess on the auxiliary sphere (table 3)
    val cbm = 0.5 * (cosB1 + cosB2)
    val wbar = sqrt(1.0 - e2 * cbm * cbm) // eq 48
    val w12 = lamda12 / wbar
    val (sigma12, alpha1v, alpha2v) = sphereDistanceRad(blat1, 0.0, blat2, w12)
    var s12 = a * wbar * sigma12
    var alpha1 = alpha1v
    var alpha2 = alpha2v
    if (s12.isNaN) {
      val (az1, az2) = restore(alpha1, alpha2)
      return (s12, az1, az2)
    }

    val tol = 1e-12
    val sphere = f == 0.0
    val meridional = abs(sin(lamda12)) <= tol
    val deltaBlat = blat2 - blat1
    val equatorial = abs(deltaBlat) <= tol && abs(blat1) <= tol &&
      lamda12 <= (1.0 - f) * Pi
    val oblate = f >= 0
    val prolate = f < 0

    if (equatorial && !(meridional && oblate)) { alpha1 = Pi / 2; alpha2 = alpha1 }
    if (meridional && !(equatorial && prolate)) {
      alpha1 = signum(deltaBlat) * lamda12
      alpha2 = lamda12 - alpha1
    }
    val nearlyAntipodal = !sphere && !equatorial &&
      sigma12 >= Pi * (1.0 - 3.0 * abs(f) * cosB1 * cosB1)
    if (nearlyAntipodal)
      alpha1 = solveAstroid(blat1, blat2, lamda12, cosB1)

    val shortDistance = s12 < a * 1e-4
    val doNewton = !(equatorial || meridional || shortDistance || sphere) || nearlyAntipodal
    if (doNewton)
      alpha1 = solveAlpha1(alpha1, blat1, blat2, lamda12)
    val doHybrid = !(equatorial || shortDistance || sphere) || nearlyAntipodal
    if (doHybrid) {
      val (s, a2) = solveHybrid(alpha1, blat1, blat2)
      s12 = s; alpha2 = a2
    }
    val (az1, az2) = restore(alpha1, alpha2)
    (s12, az1, az2)
  }
}

object Karney {
  /** Guard against division blow-ups; matches the reference solver. */
  val TINY = 1e-150

  // Series coefficients of Karney (2013) eqs 17, 18, 21, 24, 25, 42, 43
  // (6th order; highest power first for Horner evaluation).
  private[geo] val A1Coefficients = Array(1.0 / 256, 1.0 / 64, 1.0 / 4, 1.0)
  private[geo] val C1Coefficients: Array[Array[Double]] = Array(
    Array(-1.0 / 32, 3.0 / 16, -1.0 / 2),
    Array(-9.0 / 2048, 1.0 / 32, -1.0 / 16),
    Array(3.0 / 256, -1.0 / 48),
    Array(3.0 / 512, -5.0 / 512),
    Array(-7.0 / 1280),
    Array(-7.0 / 2048))
  private[geo] val CM1Coefficients: Array[Array[Double]] = Array(
    Array(205.0 / 1536, -9.0 / 32, 1.0 / 2),
    Array(1335.0 / 4096, -37.0 / 96, 5.0 / 16),
    Array(-75.0 / 128, 29.0 / 96),
    Array(-2391.0 / 2560, 539.0 / 1536),
    Array(3467.0 / 7680),
    Array(38081.0 / 61440))
  private[geo] val A2Coefficients = Array(25.0 / 256, 9.0 / 64, 1.0 / 4, 1.0)
  private[geo] val C2Coefficients: Array[Array[Double]] = Array(
    Array(1.0 / 32, 1.0 / 16, 1.0 / 2),
    Array(35.0 / 2048, 1.0 / 32, 3.0 / 16),
    Array(5.0 / 256, 5.0 / 48),
    Array(7.0 / 512, 35.0 / 512),
    Array(63.0 / 1280),
    Array(77.0 / 2048))
  private[geo] val A3Coefficients: Array[Array[Double]] = Array(
    Array(-3.0 / 128),
    Array(-2.0 / 64, -3.0 / 64),
    Array(-1.0 / 16, -3.0 / 16, -1.0 / 16),
    Array(3.0 / 8, -1.0 / 8, -1.0 / 4),
    Array(1.0 / 2, -1.0 / 2),
    Array(1.0))
  /** C3 rows: leading numerators + trailing denominator. */
  private[geo] val C3Coefficients: Array[Array[Array[Double]]] = Array(
    Array(Array(3, 128.0), Array(2, 5, 128.0), Array(-1, 3, 3, 64.0),
      Array(-1, 0, 1, 8.0), Array(-1, 1, 4.0)),
    Array(Array(5, 256.0), Array(1, 3, 128.0), Array(-3, -2, 3, 64.0),
      Array(1, -3, 2, 32.0)),
    Array(Array(7, 512.0), Array(-10, 9, 384.0), Array(5, -9, 5, 192.0)),
    Array(Array(7, 512.0), Array(-14, 7, 512.0)),
    Array(Array(21, 2560.0)))

  @inline private[geo] def polyval(c: Array[Double], x: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc = acc * x + c(i); i += 1 }
    acc
  }

  /** C_ij(eps) rows: eps^l * polyval(row_l, eps or eps^2). */
  private[geo] def evalCij(rows: Array[Array[Double]], epsi: Double,
                           squared: Boolean): Array[Double] = {
    val arg = if (squared) epsi * epsi else epsi
    val out = new Array[Double](rows.length)
    var factor = 1.0
    var i = 0
    while (i < rows.length) {
      factor *= epsi
      out(i) = factor * polyval(rows(i), arg)
      i += 1
    }
    out
  }

  /** Clenshaw summation of sum c(i-1) * sin(2 i x) (Karney eq 59). */
  private[geo] def cosineSum(c: Array[Double], x: Double): Double = {
    val cosx = cos(x); val sinx = sin(x)
    val factor = 2.0 * (cosx - sinx) * (cosx + sinx)
    var y0 = 0.0; var y1 = 0.0
    var n = c.length
    if (n % 2 == 1) { y0 = c(n - 1); n -= 1 }
    var k = n - 1
    while (k >= 1) {
      y1 = factor * y0 - y1 + c(k)
      y0 = factor * y1 - y0 + c(k - 1)
      k -= 2
    }
    2.0 * sinx * cosx * y0
  }

  /** Positive root of the astroid quartic
    * k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0 (Karney eq 55).
    */
  private[geo] def astroidK(x: Double, y: Double): Double = {
    val p = x * x; val q = y * y
    val r = (p + q - 1.0) / 6.0
    if (q == 0.0 && r <= 0.0) return 0.0
    val pq4 = p * q / 4.0
    val r2 = r * r; val r3 = r * r2
    val disc = pq4 * (pq4 + 2.0 * r3)
    var u = r
    if (disc >= 0) {
      var t3 = pq4 + r3
      t3 += (if (t3 < 0) -1.0 else 1.0) * sqrt(disc)
      val t = signum(t3) * nthroot(abs(t3), 3)
      u += t + (if (t != 0.0) r2 / t else 0.0)
    } else {
      val ang = atan2(sqrt(-disc), -(pq4 + r3))
      u += 2.0 * r * cos(ang / 3.0)
    }
    val v = sqrt(u * u + q)
    val uv = if (u < 0) q / (v - u) else u + v
    val w = (uv - q) / (2.0 * v)
    uv / (sqrt(uv + w * w) + w)
  }

  /** Spherical inverse problem (Karney eqs 49-51): returns
    * (arc distance [rad], azimuth1, azimuth2).
    */
  def sphereDistanceRad(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double, Double) = {
    val w = lon2 - lon1
    val cb1 = cos(lat1); val sb1 = sin(lat1)
    val cb2 = cos(lat2); val sb2 = sin(lat2)
    val cw = cos(w); val sw = sin(w)
    val sinA1 = cb2 * sw
    val cosA1 = cb1 * sb2 - sb1 * cb2 * cw
    val sinA2 = cb1 * sw
    val cosA2 = -cb2 * sb1 + sb2 * cb1 * cw
    val cosDist = sb1 * sb2 + cb1 * cb2 * cw
    val sinDist = hypot(sinA1, cosA1)
    (atan2(sinDist, cosDist), atan2(sinA1, cosA1), atan2(sinA2, cosA2))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[(Double, Double), Karney]()
  def apply(a: Double, f: Double): Karney =
    cache.computeIfAbsent((a, f), { case (aa, ff) => new Karney(aa, ff) })

  val WGS84: Karney = apply(Ellipsoids.WGS84.a, Ellipsoids.WGS84.f)
}
