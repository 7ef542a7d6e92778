package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.geo

/** Time-series (track) operators over position fixes: interpolation
  * between fixes, Savitzky-Golay smoothing, and course over ground —
  * the Spark mapping of the reference's `interp_nvectors` /
  * `course_over_ground` (reference: src/envector/core.py:586-950).
  *
  * Per-track sequences are window functions (`lag`/`lead` over
  * partitionBy(track)) wherever possible; only the convolution-style
  * smoother drops to `flatMapGroups`, which still distributes by
  * track id.
  */
object Tracks {

  /** Linear n-vector interpolation of query times into a track of
    * fixes (as-of join + geodesic lerp; reference `interp_nvectors`
    * kind="linear").
    *
    * @param fixes   (trackCol, tCol, nvecCol) rows
    * @param queries (trackCol, tCol) rows (query times); other query
    *                columns are NOT carried — join results back on
    *                (trackCol, tCol) if you need them
    * @return (trackCol, tCol, nvecCol) rows, one per query row
    *         (`nvecCol` null outside the track's time span)
    */
  def interpolateLinear(fixes: DataFrame, queries: DataFrame,
                        trackCol: String, tCol: String, nvecCol: String): DataFrame = {
    val f = fixes.select(col(trackCol), col(tCol), col(nvecCol))
      .withColumn("__isfix", lit(1))
    val q = queries.select(col(trackCol), col(tCol))
      .withColumn(nvecCol, lit(null).cast(f.schema(nvecCol).dataType))
      .withColumn("__isfix", lit(0))
    // classic union as-of: last fix at or before t, first fix at or after
    val all = f.unionByName(q)
    val wPrev = Window.partitionBy(trackCol)
      .orderBy(col(tCol), col("__isfix").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(trackCol)
      .orderBy(col(tCol).desc, col("__isfix").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fixT = when(col("__isfix") === 1, col(tCol))
    val fixN = when(col("__isfix") === 1, col(nvecCol))
    val bracketed = all
      .withColumn("__pt", last(fixT, ignoreNulls = true).over(wPrev))
      .withColumn("__pn", last(fixN, ignoreNulls = true).over(wPrev))
      .withColumn("__nt", last(fixT, ignoreNulls = true).over(wNext))
      .withColumn("__nn", last(fixN, ignoreNulls = true).over(wNext))
      .filter(col("__isfix") === 0)
    val frac = when(col("__nt") === col("__pt"), 0.0)
      .otherwise((col(tCol) - col("__pt")) / (col("__nt") - col("__pt")))
    bracketed
      .withColumn(nvecCol, when(col("__pt").isNotNull && col("__nt").isNotNull,
        geo.interpolate(col("__pn"), col("__nn"), frac)))
      .drop("__isfix", "__pt", "__pn", "__nt", "__nn")
  }

  /** Central Savitzky-Golay convolution coefficients for an odd
    * window and polynomial order: c = e0^T (A^T A)^-1 A^T with
    * A[i][j] = i^j, i in [-m, m] (the standard least-squares filter
    * the reference applies via scipy.signal.savgol_filter).
    */
  def savgolCoefficients(windowLength: Int, polyorder: Int): Array[Double] = {
    require(windowLength % 2 == 1 && polyorder < windowLength)
    val m = windowLength / 2
    val p = polyorder + 1
    // normal matrix N = A^T A (p x p), rhs columns A^T
    val N = Array.ofDim[Double](p, p)
    for (r <- 0 until p; c <- 0 until p; i <- -m to m)
      N(r)(c) += math.pow(i, r + c)
    // solve N x = A^T e_row for the center evaluation: coefficients
    // c_k = sum_j [N^-1]_{0,j} * k^j
    val inv0 = solveRow0(N)
    Array.tabulate(windowLength) { idx =>
      val k = idx - m
      (0 until p).map(j => inv0(j) * math.pow(k, j)).sum
    }
  }

  /** Edge evaluation rows for mode="interp": row j gives the weights
    * over the first (or mirrored, last) `windowLength` samples that
    * evaluate the least-squares polynomial fit at position j — exact
    * for polynomials up to `polyorder` all the way to the ends
    * (scipy's savgol_filter mode="interp").
    */
  def savgolEdgeCoefficients(windowLength: Int, polyorder: Int): Array[Array[Double]] = {
    require(windowLength % 2 == 1 && polyorder < windowLength)
    val p = polyorder + 1
    val N = Array.ofDim[Double](p, p)
    for (r <- 0 until p; c <- 0 until p; i <- 0 until windowLength)
      N(r)(c) += math.pow(i, r + c)
    val inv = invert(N)
    Array.tabulate(windowLength) { j =>
      // w_jk = sum_r j^r * [N^-1 A^T]_{r,k} = sum_r j^r sum_c inv(r)(c) k^c
      Array.tabulate(windowLength) { k =>
        (0 until p).map { r =>
          math.pow(j, r) * (0 until p).map(c => inv(r)(c) * math.pow(k, c)).sum
        }.sum
      }
    }
  }

  private def invert(n0: Array[Array[Double]]): Array[Array[Double]] = {
    val p = n0.length
    val a = Array.tabulate(p, 2 * p)((r, c) =>
      if (c < p) n0(r)(c) else if (c - p == r) 1.0 else 0.0)
    for (col0 <- 0 until p) {
      val piv = (col0 until p).maxBy(r => math.abs(a(r)(col0)))
      val tmp = a(col0); a(col0) = a(piv); a(piv) = tmp
      val d = a(col0)(col0)
      for (c <- 0 until 2 * p) a(col0)(c) /= d
      for (r <- 0 until p if r != col0) {
        val factor = a(r)(col0)
        for (c <- 0 until 2 * p) a(r)(c) -= factor * a(col0)(c)
      }
    }
    Array.tabulate(p, p)((r, c) => a(r)(p + c))
  }

  /** First row of the inverse of a small SPD matrix (one Gaussian
    * elimination — the matrices here are tiny, so taking row 0 of the
    * full inverse costs the same and avoids a duplicated kernel).
    */
  private def solveRow0(n0: Array[Array[Double]]): Array[Double] = invert(n0)(0)

  /** Second derivatives M_i of the NOT-A-KNOT cubic spline through
    * (t_i, y_i) — the boundary condition scipy's
    * `interp1d(kind='cubic')` uses (reference core.py:643 passes
    * `kind` straight to interp1d), solved by corner-eliminating the
    * two not-a-knot rows into the tridiagonal interior system
    * (Thomas algorithm, O(n)). Requires n >= 4.
    */
  def notAKnotSplineM(t: Array[Double], y: Array[Double]): Array[Double] = {
    val n = t.length
    require(n >= 4, "not-a-knot cubic spline needs >= 4 points")
    val h = Array.tabulate(n - 1)(i => t(i + 1) - t(i))
    val d = Array.tabulate(n - 2)(j => {
      val i = j + 1
      6.0 * ((y(i + 1) - y(i)) / h(i) - (y(i) - y(i - 1)) / h(i - 1))
    })
    val m = n - 2 // unknowns M_1..M_{n-2}
    val a = new Array[Double](m); val b = new Array[Double](m); val c = new Array[Double](m)
    var j = 0
    while (j < m) {
      val i = j + 1
      a(j) = h(i - 1); b(j) = 2.0 * (h(i - 1) + h(i)); c(j) = h(i)
      j += 1
    }
    // not-a-knot at both ends folded into the first/last interior rows:
    // M_0 = ((h0+h1) M_1 - h0 M_2) / h1 and symmetric at the far end
    b(0) = h(0) * (h(0) + h(1)) / h(1) + 2.0 * (h(0) + h(1))
    c(0) = h(1) - h(0) * h(0) / h(1)
    a(0) = 0.0
    val hl = h(n - 2); val hp = h(n - 3)
    a(m - 1) = hp - hl * hl / hp
    b(m - 1) = 2.0 * (hp + hl) + hl * (hp + hl) / hp
    c(m - 1) = 0.0
    // Thomas
    val cp = new Array[Double](m); val dp = new Array[Double](m)
    cp(0) = c(0) / b(0); dp(0) = d(0) / b(0)
    j = 1
    while (j < m) {
      val den = b(j) - a(j) * cp(j - 1)
      cp(j) = c(j) / den
      dp(j) = (d(j) - a(j) * dp(j - 1)) / den
      j += 1
    }
    val x = new Array[Double](m)
    x(m - 1) = dp(m - 1)
    j = m - 2
    while (j >= 0) { x(j) = dp(j) - cp(j) * x(j + 1); j -= 1 }
    val out = new Array[Double](n)
    System.arraycopy(x, 0, out, 1, m)
    out(0) = ((h(0) + h(1)) * out(1) - h(0) * out(2)) / h(1)
    out(n - 1) = ((hp + hl) * out(n - 2) - hl * out(n - 3)) / hp
    out
  }

  /** Evaluate the spline (knots t, values y, second derivatives m) at
    * x; NaN outside [t.head, t.last] (scipy bounds_error=False).
    */
  def splineEval(t: Array[Double], y: Array[Double], m: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    var i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) { if (i == n - 1) i = n - 2 } else i = math.max(0, -i - 2)
    val h = t(i + 1) - t(i)
    val u = t(i + 1) - x; val v = x - t(i)
    (m(i) * u * u * u + m(i + 1) * v * v * v) / (6.0 * h) +
      (y(i) / h - m(i) * h / 6.0) * u + (y(i + 1) / h - m(i + 1) * h / 6.0) * v
  }

  /** Knot vector for B-spline interpolation of order k through sites
    * x — scipy `make_interp_spline`'s default rules: endpoint knots of
    * multiplicity k+1; interior knots at the data sites with the
    * not-a-knot trim for odd k (de Boor XIII(12)), at the site
    * MIDPOINTS (first/last midpoints dropped) for even k (scipy's
    * k=2 rule, generalized to k=4 by trimming k/2 midpoints per side
    * so the collocation system stays square).
    */
  def interpKnots(x: Array[Double], k: Int): Array[Double] = {
    val n = x.length
    val interior: Array[Double] =
      if (k % 2 == 1) { val m = (k - 1) / 2; x.slice(m + 1, n - m - 1) }
      else {
        val mid = Array.tabulate(n - 1)(i => (x(i) + x(i + 1)) / 2.0)
        mid.slice(k / 2, n - 1 - k / 2)
      }
    Array.fill(k + 1)(x(0)) ++ interior ++ Array.fill(k + 1)(x(n - 1))
  }

  /** Index of the knot span containing x: largest i in [k, nCoef-1]
    * with t(i) <= x (right end clamps into the last span).
    */
  private def findSpan(t: Array[Double], k: Int, nCoef: Int, x: Double): Int = {
    if (x >= t(nCoef)) return nCoef - 1
    var lo = k; var hi = nCoef - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (t(mid) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** The k+1 nonzero B-spline basis values B_{span-k..span}(x)
    * (Cox-de Boor, the standard triangular scheme).
    */
  private def basisFuns(t: Array[Double], k: Int, span: Int, x: Double): Array[Double] = {
    val nv = new Array[Double](k + 1)
    val left = new Array[Double](k + 1)
    val right = new Array[Double](k + 1)
    nv(0) = 1.0
    var j = 1
    while (j <= k) {
      left(j) = x - t(span + 1 - j)
      right(j) = t(span + j) - x
      var saved = 0.0
      var r = 0
      while (r < j) {
        val temp = nv(r) / (right(r + 1) + left(j - r))
        nv(r) = saved + right(r + 1) * temp
        saved = left(j - r) * temp
        r += 1
      }
      nv(j) = saved
      j += 1
    }
    nv
  }

  /** B-spline coefficients interpolating (x, y) at order k >= 2 with
    * [[interpKnots]] knots: banded collocation solve, O(n k^2). No
    * pivoting — B-spline collocation matrices satisfying the
    * Schoenberg-Whitney conditions are totally positive, for which
    * plain Gaussian elimination is backward stable (de Boor, A
    * Practical Guide to Splines, ch. XIII). Each row's nonzeros lie
    * within columns [i-k, i+k], so rows are stored as width-(2k+1)
    * windows and elimination never fills outside them.
    */
  def bsplineInterpCoefs(x: Array[Double], y: Array[Double], k: Int): Array[Double] = {
    val n = x.length
    require(n >= k + 1, s"order-$k B-spline interpolation needs >= ${k + 1} points")
    val t = interpKnots(x, k)
    val w = 2 * k + 1
    val a = Array.ofDim[Double](n, w) // a(i)(c - i + k) = A[i][c]
    val rhs = y.clone()
    var i = 0
    while (i < n) {
      val span = findSpan(t, k, n, x(i))
      val b = basisFuns(t, k, span, x(i))
      var r = 0
      while (r <= k) {
        val cc = span - k + r
        a(i)(cc - i + k) = b(r)
        r += 1
      }
      i += 1
    }
    i = 0
    while (i < n) {
      val piv = a(i)(k)
      var r = i + 1
      while (r <= math.min(i + k, n - 1)) {
        val f = a(r)(i - r + k) / piv
        if (f != 0.0) {
          var c = i
          while (c <= math.min(i + k, n - 1)) {
            a(r)(c - r + k) -= f * a(i)(c - i + k)
            c += 1
          }
          rhs(r) -= f * rhs(i)
        }
        r += 1
      }
      i += 1
    }
    val out = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var acc = rhs(i)
      var c = i + 1
      while (c <= math.min(i + k, n - 1)) { acc -= a(i)(c - i + k) * out(c); c += 1 }
      out(i) = acc / a(i)(k)
      i -= 1
    }
    out
  }

  /** Evaluate the order-k interpolating B-spline of (x, y) at each xi;
    * NaN outside [x.head, x.last] (scipy bounds_error=False). The
    * generic path behind interp1d kind='quadratic' and integer spline
    * orders (reference core.py:607-614 passes `kind` to interp1d).
    */
  def bsplineInterpEval(x: Array[Double], y: Array[Double], k: Int,
                        xi: Array[Double]): Array[Double] = {
    val n = x.length
    val t = interpKnots(x, k)
    val c = bsplineInterpCoefs(x, y, k)
    xi.map { v =>
      if (v < x(0) || v > x(n - 1) || v.isNaN) Double.NaN
      else {
        val span = findSpan(t, k, n, v)
        val b = basisFuns(t, k, span, v)
        var acc = 0.0
        var r = 0
        while (r <= k) { acc += b(r) * c(span - k + r); r += 1 }
        acc
      }
    }
  }

  /** Linear interpolation with NaN outside the span (scipy interp1d
    * kind='linear'/'slinear', bounds_error=False).
    */
  def linearEval(t: Array[Double], y: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    var i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) return y(if (i == n - 1) n - 1 else i)
    i = -i - 2
    val f = (x - t(i)) / (t(i + 1) - t(i))
    y(i) + f * (y(i + 1) - y(i))
  }

  /** kind='zero': order-0 spline = previous-knot step function. */
  def zeroEval(t: Array[Double], y: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    val i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) y(i) else y(-i - 2)
  }

  /** kind='nearest': value at the closest knot (scipy rounds exact
    * midpoints DOWN via searchsorted on t - that convention).
    */
  def nearestEval(t: Array[Double], y: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    var i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) return y(i)
    i = -i - 2
    val midpoint = (t(i) + t(i + 1)) / 2.0
    if (x <= midpoint) y(i) else y(i + 1)
  }

  /** kind='nearest-up': like nearest but exact midpoints round UP
    * (scipy's companion convention).
    */
  def nearestUpEval(t: Array[Double], y: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    var i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) return y(i)
    i = -i - 2
    val midpoint = (t(i) + t(i + 1)) / 2.0
    if (x < midpoint) y(i) else y(i + 1)
  }

  /** kind='next': value of the first knot at or after x. */
  def nextEval(t: Array[Double], y: Array[Double], x: Double): Double = {
    val n = t.length
    if (x < t(0) || x > t(n - 1) || x.isNaN) return Double.NaN
    val i = java.util.Arrays.binarySearch(t, x)
    if (i >= 0) y(i) else y(-i - 1)
  }

  /** Pure-Scala port of the reference `_interp_vectors` +
    * `interp_nvectors` tail (core.py:586-744): optional Savitzky-Golay
    * pre-filter along time (mode 'interp'/'nearest', NO
    * renormalization — exactly scipy's call order), then per-component
    * interpolation of each row at the query times. Rows beyond the
    * first three (e.g. depth z, objects.py:945-948) are interpolated
    * identically; the CALLER renormalizes rows 0-2 to unit.
    *
    * kind: "linear"/"slinear", "quadratic" (order-2 B-spline,
    * midpoint knots = scipy interp1d), "cubic" (not-a-knot, = scipy
    * interp1d), "nearest", "zero" (previous-knot step), or an integer
    * spline order "0".."5", plus the step kinds "previous"/"next"/
    * "nearest-up" — the same `kind` values the reference forwards to
    * interp1d (core.py:607-614). Tracks too short for the
    * requested order degrade to the highest feasible order and
    * ultimately to linear (scipy raises there; a distributed operator
    * must not kill the job for a 3-fix track).
    *
    * mode: Savitzky-Golay edge handling — "interp" (edge polynomial
    * fits), "nearest" (replicate), "mirror" (reflect without
    * repeating the edge sample), "constant" (pad with `cval`), "wrap"
    * (circular) — scipy savgol_filter's mode set.
    */
  def interpVectors(tI: Array[Double], t: Array[Double], rows: Array[Array[Double]],
                    kind: String = "linear", windowLength: Int = 0,
                    polyorder: Int = 2, mode: String = "interp",
                    cval: Double = 0.0): Array[Array[Double]] = {
    require(Set("linear", "slinear", "cubic", "nearest", "nearest-up",
      "zero", "quadratic", "previous", "next")(kind)
      || kind.matches("[0-5]"), s"unsupported kind $kind")
    require(Set("interp", "nearest", "mirror", "constant", "wrap")(mode),
      s"unsupported savgol mode $mode")
    val n = t.length
    val smoothed =
      if (windowLength <= 0) rows
      else {
        var wl = windowLength + (windowLength + 1) % 2
        if (wl >= n) wl = math.max(n - 1 - n % 2, 1)
        if (wl <= polyorder) rows
        else {
          val coeff = savgolCoefficients(wl, polyorder)
          val edge = if (mode == "interp") savgolEdgeCoefficients(wl, polyorder) else null
          val half = wl / 2
          // out-of-range sample index per padding mode (wl < n, so a
          // single reflection suffices for 'mirror')
          def padded(row: Array[Double], idx: Int): Double =
            if (idx >= 0 && idx < n) row(idx)
            else mode match {
              case "nearest" => row(math.min(n - 1, math.max(0, idx)))
              case "mirror" => row(if (idx < 0) -idx else 2 * n - 2 - idx)
              case "wrap" => row(java.lang.Math.floorMod(idx, n))
              case _ => cval // "constant"
            }
          rows.map { row =>
            Array.tabulate(n) { i =>
              if (edge != null && i < half) {
                var acc = 0.0; var kk = 0
                while (kk < wl) { acc += edge(i)(kk) * row(kk); kk += 1 }
                acc
              } else if (edge != null && i >= n - half) {
                val er = edge(wl - (n - i))
                var acc = 0.0; var kk = 0
                while (kk < wl) { acc += er(kk) * row(n - wl + kk); kk += 1 }
                acc
              } else {
                var acc = 0.0; var kk = 0
                while (kk < wl) {
                  acc += coeff(kk) * padded(row, i - half + kk)
                  kk += 1
                }
                acc
              }
            }
          }
        }
      }
    val order = kind match {
      case "nearest" => -1
      case "nearest-up" => -2
      case "next" => -3
      case "zero" | "previous" => 0 // scipy 'previous' = the order-0 spline step
      case "linear" | "slinear" => 1
      case "quadratic" => 2
      case "cubic" => 3
      case d => d.toInt
    }
    val eff = if (order > 1) math.min(order, n - 1) else order
    eff match {
      case -1 => smoothed.map(row => tI.map(x => nearestEval(t, row, x)))
      case -2 => smoothed.map(row => tI.map(x => nearestUpEval(t, row, x)))
      case -3 => smoothed.map(row => tI.map(x => nextEval(t, row, x)))
      case 0 => smoothed.map(row => tI.map(x => zeroEval(t, row, x)))
      case 3 =>
        // specialized O(n) not-a-knot Thomas solve (same spline the
        // generic order-3 collocation produces)
        smoothed.map { row =>
          val m = notAKnotSplineM(t, row)
          tI.map(x => splineEval(t, row, m, x))
        }
      case k if k >= 2 => smoothed.map(row => bsplineInterpEval(t, row, k, tI))
      case _ => smoothed.map(row => tI.map(x => linearEval(t, row, x)))
    }
  }

  /** Spline (or linear) n-vector interpolation of query times into
    * tracks of fixes, distributing per track via cogroup — the Spark
    * mapping of the reference `interp_nvectors(kind='cubic')` /
    * `Nvector.interpolate` (z carried as a 4th interpolated row when
    * `zCol` is given, objects.py:945-948). Output: (trackCol, tCol,
    * nvecCol[, zCol]), ONE row per distinct (track, t) query point;
    * queries outside a track's span get NaN components (reference
    * bounds_error=False semantics).
    */
  def interpolateSpline(fixes: DataFrame, queries: DataFrame,
                        trackCol: String, tCol: String, nvecCol: String,
                        zCol: Option[String] = None, kind: String = "cubic",
                        windowLength: Int = 0, polyorder: Int = 2,
                        mode: String = "interp", cval: Double = 0.0): DataFrame = {
    val spark = fixes.sparkSession
    import spark.implicits._
    val zc = zCol.map(col).getOrElse(lit(0.0)).cast("double")
    val f = fixes.select(col(trackCol).cast("long"), col(tCol).cast("double"),
        col(nvecCol).getField("x"), col(nvecCol).getField("y"),
        col(nvecCol).getField("z"), zc)
      .as[(Long, Double, Double, Double, Double, Double)]
    val q = queries.select(col(trackCol).cast("long"), col(tCol).cast("double"))
      .as[(Long, Double)]
    val out = f.groupByKey(_._1).cogroup(q.groupByKey(_._1)) { (track, fit, qit) =>
      // duplicate timestamps (same-second GPS fixes, retransmits)
      // would put h=0 knots into the spline solve and NaN-poison the
      // whole track — keep one fix per timestamp, chosen by the FULL
      // tuple order (cogroup iterator order varies across retries, so
      // sorting by t alone would keep an arbitrary duplicate)
      val fs0 = fit.toArray.sorted
      val fs = if (fs0.length < 2) fs0 else {
        val b = scala.collection.mutable.ArrayBuffer(fs0.head)
        var i = 1
        while (i < fs0.length) {
          if (fs0(i)._2 != b.last._2) b += fs0(i)
          i += 1
        }
        b.toArray
      }
      // one output row per DISTINCT query point: the relational
      // mirrors group by (track, t), so duplicate query rows must not
      // fan out here (the interpolated value is identical anyway)
      val ts = qit.map(_._2).toArray.distinct.sorted
      if (fs.isEmpty || ts.isEmpty) Iterator.empty
      else {
        val t = fs.map(_._2)
        val rows = Array(fs.map(_._3), fs.map(_._4), fs.map(_._5), fs.map(_._6))
        val itp = interpVectors(ts, t, rows, kind, windowLength, polyorder, mode, cval)
        ts.indices.iterator.map { i =>
          // unit(..., NaN) = reference norm_zero_vector=np.nan; NaN
          // components (out-of-span queries) propagate through unit()
          val u = graft.geo.VecMath.unit(
            graft.geo.Vec3(itp(0)(i), itp(1)(i), itp(2)(i)), zeroFill = Double.NaN)
          (track, ts(i), u.x, u.y, u.z, itp(3)(i))
        }
      }
    }.toDF(trackCol, tCol, "__x", "__y", "__z", "__depth")
    val withN = out.withColumn(nvecCol, geo.vec(col("__x"), col("__y"), col("__z")))
      .drop("__x", "__y", "__z")
    zCol match {
      case Some(zc0) => withN.withColumnRenamed("__depth", zc0)
      case None => withN.drop("__depth")
    }
  }

  /** Savitzky-Golay smoothing as PURE WINDOW FUNCTIONS (no per-track
    * buffering): each output is a fixed set of lag/lead taps with
    * 'nearest' edge padding supplied by first/last over the partition.
    * This is the scale path — memory per row is O(windowLength), so
    * adversarial million-fix tracks stream through the window sort
    * instead of materializing in one task (the [[savgolSmooth]]
    * buffered variant remains for mode='interp', whose edge fits need
    * the whole end windows).
    *
    * Exactly equivalent to savgolSmooth(mode="nearest") when the
    * effective window (after the reference's odd/length truncation
    * rules) equals `windowLength` — i.e. tracks longer than
    * windowLength, the normal case at scale; shorter tracks should use
    * the buffered variant, which applies the truncation rules.
    */
  def savgolSmoothWindowed(fixes: DataFrame, trackCol: String, tCol: String,
                           nvecCol: String, windowLength: Int,
                           polyorder: Int = 2): DataFrame = {
    require(windowLength % 2 == 1 && polyorder < windowLength)
    val coeff = savgolCoefficients(windowLength, polyorder)
    val m = windowLength / 2
    val w = Window.partitionBy(trackCol).orderBy(tCol)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val flds = Seq("x", "y", "z")
    // stage each component and its partition first/last ONCE: an
    // unbounded-frame first/last aggregates the whole partition per
    // expression, so repeating it inside every tap (the previous
    // form) multiplied that cost by the window length — 3.3x slower
    // than the buffered variant at sf0.1. Six staged aggregates +
    // pure lag/lead taps; the tap windows share the staging window's
    // partitioning and sort, so no extra exchange.
    val staged = flds.foldLeft(fixes) { (df, f) =>
      df.withColumn(s"__v$f", col(nvecCol).getField(f))
        .withColumn(s"__hd$f", first(col(nvecCol).getField(f)).over(wAll))
        .withColumn(s"__tl$f", last(col(nvecCol).getField(f)).over(wAll))
    }
    def tap(f: String, j: Int): Column =
      if (j < 0) coalesce(lag(col(s"__v$f"), -j).over(w), col(s"__hd$f"))
      else if (j > 0) coalesce(lead(col(s"__v$f"), j).over(w), col(s"__tl$f"))
      else col(s"__v$f")
    def smooth(f: String): Column =
      (-m to m).map(j => tap(f, j) * lit(coeff(j + m))).reduce(_ + _)
    staged
      .withColumn("__sx", smooth("x"))
      .withColumn("__sy", smooth("y"))
      .withColumn("__sz", smooth("z"))
      .withColumn(nvecCol,
        geo.vunit(geo.vec(col("__sx"), col("__sy"), col("__sz"))))
      .drop(flds.flatMap(f => Seq(s"__v$f", s"__hd$f", s"__tl$f")) ++
        Seq("__sx", "__sy", "__sz"): _*)
  }

  /** Smoothed track positions: per-track Savitzky-Golay over each
    * n-vector component (edge modes 'nearest'/'mirror'/'constant'
    * (+cval)/'wrap'/'interp' — scipy savgol_filter's set, 'nearest'
    * default), renormalized to unit length. Distributes per track via
    * typed groups.
    *
    * NOTE (scale bound): this variant buffers one whole track per
    * group — correct for vehicle-track cardinalities (10^3..10^5
    * fixes); for unbounded tracks use [[savgolSmoothWindowed]], which
    * needs only O(windowLength) state per row. This one remains the
    * path for mode='interp' (edge polynomial fits need the full end
    * windows) and for tracks shorter than the window (reference
    * truncation rules).
    */
  def savgolSmooth(fixes: DataFrame, trackCol: String, tCol: String,
                   nvecCol: String, windowLength: Int, polyorder: Int = 2,
                   mode: String = "nearest", cval: Double = 0.0): DataFrame = {
    require(Set("interp", "nearest", "mirror", "constant", "wrap")(mode),
      s"unsupported mode $mode")
    val spark = fixes.sparkSession
    import spark.implicits._
    val rows = fixes.select(col(trackCol).cast("long"), col(tCol).cast("double"),
        col(nvecCol).getField("x"), col(nvecCol).getField("y"), col(nvecCol).getField("z"))
      .as[(Long, Double, Double, Double, Double)]
    val out = rows.groupByKey(_._1).flatMapGroups { (track, it) =>
      val fs = it.toArray.sortBy(_._2)
      val n = fs.length
      // reference _check_window_length: odd, < n
      var wl = windowLength + (windowLength + 1) % 2
      if (wl >= n) wl = math.max(n - 1 - n % 2, 1)
      if (wl <= polyorder) {
        fs.iterator.map { case (_, t, x, y, z) => (track, t, x, y, z) }
      } else {
        val coeff = savgolCoefficients(wl, polyorder)
        val edge = if (mode == "interp") savgolEdgeCoefficients(wl, polyorder) else null
        val m = wl / 2
        def smooth(get: Int => Double)(i: Int): Double = {
          if (edge != null && i < m) {
            // head: evaluate the head-window polynomial fit at i
            val row = edge(i)
            var acc = 0.0; var k = 0
            while (k < wl) { acc += row(k) * get(k); k += 1 }
            acc
          } else if (edge != null && i >= n - m) {
            // tail: evaluate the tail-window fit at the local offset
            val row = edge(wl - (n - i))
            var acc = 0.0; var k = 0
            while (k < wl) { acc += row(k) * get(n - wl + k); k += 1 }
            acc
          } else {
            // out-of-range index per padding mode (scipy savgol_filter
            // mode semantics; wl < n so one reflection suffices)
            def padded(idx: Int): Double =
              if (idx >= 0 && idx < n) get(idx)
              else mode match {
                case "nearest" => get(math.min(n - 1, math.max(0, idx)))
                case "mirror" => get(if (idx < 0) -idx else 2 * n - 2 - idx)
                case "wrap" => get(java.lang.Math.floorMod(idx, n))
                case _ => cval // "constant"
              }
            var acc = 0.0; var k = 0
            while (k < wl) {
              acc += coeff(k) * padded(i - m + k)
              k += 1
            }
            acc
          }
        }
        (0 until n).iterator.map { i =>
          val sx = smooth(j => fs(j)._3)(i)
          val sy = smooth(j => fs(j)._4)(i)
          val sz = smooth(j => fs(j)._5)(i)
          val u = graft.geo.VecMath.unit(graft.geo.Vec3(sx, sy, sz))
          (track, fs(i)._2, u.x, u.y, u.z)
        }
      }
    }.toDF(trackCol, tCol, "__x", "__y", "__z")
    out.withColumn(nvecCol, geo.vec(col("__x"), col("__y"), col("__z")))
      .drop("__x", "__y", "__z")
  }

  /** Course over ground per fix (reference core.py:837-950, no
    * smoothing — compose with [[savgolSmooth]] for the filtered
    * variant): heading between midpoint-smoothed consecutive fixes,
    * endpoints anchored on the raw end fixes. Output: input columns +
    * `cog` [rad] (NaN for single-fix tracks).
    *
    * `dropSingletons = true` removes single-fix tracks (the only NaN
    * producers) via the already-computed lag/lead columns instead of
    * leaving callers to `filter(!isnan(cog))` — a downstream filter
    * on the cog column re-inlines the whole azimuth tree into the
    * filter condition AND the sort-sampling pass (measured 10x on the
    * sf0.1 gate), while this predicate only references the window
    * outputs.
    */
  def courseOverGround(fixes: DataFrame, trackCol: String, tCol: String,
                       nvecCol: String,
                       a: Double = graft.geo.Ellipsoids.WGS84.a,
                       f: Double = graft.geo.Ellipsoids.WGS84.f,
                       dropSingletons: Boolean = false): DataFrame = {
    val w = Window.partitionBy(trackCol).orderBy(tCol)
    val mid = (u: Column, v: Column) => geo.vunit(geo.vadd(u, v))
    // the bearing goes through one static-call expression node:
    // composed Column math here would re-inline the midpoint structs
    // into an exponentially wide tree (minutes of analyzer/codegen
    // time), while a single static call keeps the plan flat
    val lagged = fixes
      .withColumn("__prev", lag(col(nvecCol), 1).over(w))
      .withColumn("__next", lead(col(nvecCol), 1).over(w))
    val kept =
      if (dropSingletons)
        lagged.filter(col("__prev").isNotNull || col("__next").isNotNull)
      else lagged
    kept
      .withColumn("__from", when(col("__prev").isNull, col(nvecCol))
        .otherwise(mid(col("__prev"), col(nvecCol))))
      .withColumn("__to", when(col("__next").isNull, col(nvecCol))
        .otherwise(mid(col(nvecCol), col("__next"))))
      .withColumn("cog",
        when(col("__prev").isNull && col("__next").isNull, lit(Double.NaN))
          .otherwise(geo.azimuthFast(col("__from"), col("__to"), a, f)))
      .drop("__prev", "__next", "__from", "__to")
  }

  /** Implied-speed outlier flagging — the standard GPS track-cleaning
    * filter: each fix's speed is the great-circle distance from the
    * PREVIOUS fix divided by the elapsed time, and fixes faster than
    * `maxSpeedMps` are flagged (teleports from multipath / wrong-unit
    * timestamps / identity mixups). The first fix of a track has no
    * predecessor: null speed, never flagged. A duplicate timestamp is
    * assigned +Infinity speed EXPLICITLY and flagged (loudly visible,
    * and independent of spark.sql.ansi.enabled — the raw division
    * would throw DIVIDE_BY_ZERO under ANSI, killing the job for one
    * bad fix); the window breaks time ties on the position components
    * so WHICH duplicate reads as first — and the speed of the fix
    * after the pair — is deterministic across runs, not left to
    * partition order; null time/position rows are dropped as in the
    * other track operators. Map-only except the one (track) window
    * shuffle.
    *
    * @return input columns + speed_mps (double, null on first fix) +
    *         too_fast (boolean, false on first fix).
    */
  def speedFlags(fixes: DataFrame, trackCol: String, tCol: String,
                 nvecCol: String, maxSpeedMps: Double,
                 sphereRadius: Double = graft.geo.Ellipsoids.MeanEarthRadius)
      : DataFrame = {
    require(maxSpeedMps > 0.0, s"maxSpeed must be > 0 (got $maxSpeedMps)")
    // struct ordering is field-by-field in declaration order, so the
    // nvec column itself is the deterministic position tie-break
    val w = Window.partitionBy(trackCol).orderBy(col(tCol), col(nvecCol))
    fixes
      .filter(col(tCol).isNotNull && col(nvecCol).isNotNull)
      .withColumn("__prev", lag(col(nvecCol), 1).over(w))
      .withColumn("__pt", lag(col(tCol), 1).over(w))
      .withColumn("speed_mps",
        when(col("__prev").isNull, lit(null).cast("double"))
          .when(col(tCol) === col("__pt"), lit(Double.PositiveInfinity))
          .otherwise(geo.gcDistance(col("__prev"), col(nvecCol), sphereRadius)
            / (col(tCol) - col("__pt"))))
      .withColumn("too_fast",
        coalesce(col("speed_mps") > maxSpeedMps, lit(false)))
      .drop("__prev", "__pt")
  }

  /** Origin-destination cell flows — the movement-analytics flow
    * matrix: each pair of CONSECUTIVE fixes of a track whose level-
    * `level` cells differ contributes one trip to (from_cell,
    * to_cell); same-cell consecutive fixes are dwell, not flow.
    * One (track) window shuffle + one aggregation whose output is
    * bounded by occupied-cell-pairs, never fix volume; time ties
    * break on the position struct as in [[speedFlags]].
    *
    * @return (from_cell, to_cell, n_trips)
    */
  def cellFlows(fixes: DataFrame, trackCol: String, tCol: String,
                nvecCol: String, level: Int): DataFrame = {
    val w = Window.partitionBy(trackCol).orderBy(col(tCol), col(nvecCol))
    fixes
      .filter(col(tCol).isNotNull && col(nvecCol).isNotNull)
      .withColumn("__cell", graft.index.cells.cellAt(col(nvecCol), level))
      .withColumn("__prev", lag(col("__cell"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") =!= col("__cell"))
      .groupBy(col("__prev").as("from_cell"), col("__cell").as("to_cell"))
      .agg(count(lit(1)).as("n_trips"))
  }

  /** ANSI-SQL mirror of the not-a-knot cubic spline track
    * interpolation ([[notAKnotSplineM]] + [[splineEval]]) for the
    * DuckDB correctness oracle: the Thomas forward/backward sweeps run
    * as recursive CTEs over the interior rows (the same corner-folded
    * tridiagonal system, identical operation order, so component
    * columns with integer-exact inputs agree bitwise and trig-derived
    * ones to ~1e-15). The elimination coefficient `cp` depends only on
    * the matrix, so one recursion solves all four components at once.
    *
    * `fixesSql` must yield (user_id, t, c1, c2, c3, c4); `queriesSql`
    * (user_id, tq). Emits a statement selecting (user_id, tq,
    * i1..i4) — raw interpolated components (NOT unit-normalized;
    * atan2-based lat/lon consumers are scale-free), out-of-span
    * queries and tracks shorter than `minFixes` omitted (the gate
    * query must apply the same `count >= minFixes` filter on the
    * engine side; minFixes >= 4 keeps every mirrored track on the
    * cubic path at any scale).
    */
  private def percomp(f: Int => String) = (1 to 4).map(f).mkString(", ")

  /** Shared mirror prelude: dedup fixes by timestamp (keeping the
    * lexicographically-smallest tuple, like the cogroup path), order
    * and count per track, drop tracks with fewer than `minFixes`
    * DISTINCT timestamps — the knot count the solver actually sees.
    * (Filtering on raw rows would let a duplicate-heavy track through
    * with too few knots: the engine would degrade the spline order
    * while this mirror still ran the full-order system on NULLs.)
    * The engine-side gate applies the same distinct-count filter.
    */
  private def orderedCtes(fixesSql: String, minFixes: Int): String =
    s""" sp_fix AS ($fixesSql),
       | sp_dedup AS (SELECT user_id, t, ${percomp(j => s"c$j")} FROM (
       |   SELECT *, row_number() OVER (PARTITION BY user_id, t
       |     ORDER BY c1, c2, c3, c4) AS rn
       |   FROM sp_fix) WHERE rn = 1),
       | sp_ord AS (SELECT *,
       |   row_number() OVER (PARTITION BY user_id ORDER BY t) AS i,
       |   count(*) OVER (PARTITION BY user_id) AS n FROM sp_dedup),
       | sp_trk AS MATERIALIZED (SELECT * FROM sp_ord WHERE n >= $minFixes)""".stripMargin

  /** Shared Thomas-algorithm CTEs over a system CTE `sp_sys` with
    * columns (user_id, j [1..m], m, av, bv, cv, d1..d4): forward and
    * backward sweeps as recursive CTEs, each buffered through a
    * MATERIALIZED wrapper — without it every iteration of the next
    * recursion (and every later reference) re-executes the whole
    * upstream recursion, which is quadratic in track length. The
    * elimination coefficient cp depends only on the matrix, so one
    * recursion carries all four components.
    */
  private def thomasCtes: String =
    s""" sp_fwd_r AS (
       |  SELECT user_id, j, m, cv / bv AS cp, ${percomp(j => s"d$j / bv AS p$j")}
       |   FROM sp_sys WHERE j = 1
       |  UNION ALL
       |  SELECT s.user_id, s.j, s.m, s.cv / (s.bv - s.av * f.cp) AS cp,
       |   ${percomp(j => s"(s.d$j - s.av * f.p$j) / (s.bv - s.av * f.cp) AS p$j")}
       |   FROM sp_fwd_r f JOIN sp_sys s ON s.user_id = f.user_id AND s.j = f.j + 1),
       | sp_fwd AS MATERIALIZED (SELECT * FROM sp_fwd_r),
       | sp_bwd_r AS (
       |  SELECT user_id, j, m, ${percomp(j => s"p$j AS x$j")}
       |   FROM sp_fwd WHERE j = m
       |  UNION ALL
       |  SELECT f.user_id, f.j, f.m, ${percomp(j => s"f.p$j - f.cp * b.x$j AS x$j")}
       |   FROM sp_bwd_r b JOIN sp_fwd f ON f.user_id = b.user_id AND f.j = b.j - 1),
       | sp_bwd AS MATERIALIZED (SELECT * FROM sp_bwd_r)""".stripMargin

  def cubicSplineMirrorSql(fixesSql: String, queriesSql: String,
                           minFixes: Int = 4): String = {
    require(minFixes >= 4)
    s"""WITH RECURSIVE
       |${orderedCtes(fixesSql, minFixes)},
       | sp_k1 AS (SELECT *,
       |   lead(t) OVER (PARTITION BY user_id ORDER BY i) - t AS h,
       |   ${percomp(j => s"lead(c$j) OVER (PARTITION BY user_id ORDER BY i) AS cn$j")},
       |   ${percomp(j => s"lag(c$j) OVER (PARTITION BY user_id ORDER BY i) AS cp$j")}
       |  FROM sp_trk),
       | sp_k2 AS (SELECT *,
       |   lag(h) OVER (PARTITION BY user_id ORDER BY i) AS hm FROM sp_k1),
       | sp_hs AS MATERIALIZED (SELECT user_id,
       |   max(CASE WHEN i = 1 THEN h END) AS h1,
       |   max(CASE WHEN i = 2 THEN h END) AS h2,
       |   max(CASE WHEN i = n - 2 THEN h END) AS hp,
       |   max(CASE WHEN i = n - 1 THEN h END) AS hl
       |  FROM sp_k1 GROUP BY user_id),
       | sp_sys AS MATERIALIZED (SELECT k.user_id, k.i - 1 AS j, k.n - 2 AS m,
       |   CASE WHEN k.i = 2 THEN 0.0
       |        WHEN k.i = k.n - 1 THEN s.hp - s.hl * s.hl / s.hp
       |        ELSE k.hm END AS av,
       |   CASE WHEN k.i = 2 THEN s.h1 * (s.h1 + s.h2) / s.h2 + 2.0 * (s.h1 + s.h2)
       |        WHEN k.i = k.n - 1 THEN 2.0 * (s.hp + s.hl) + s.hl * (s.hp + s.hl) / s.hp
       |        ELSE 2.0 * (k.hm + k.h) END AS bv,
       |   CASE WHEN k.i = 2 THEN s.h2 - s.h1 * s.h1 / s.h2
       |        WHEN k.i = k.n - 1 THEN 0.0
       |        ELSE k.h END AS cv,
       |   ${percomp(j => s"6.0 * ((k.cn$j - k.c$j) / k.h - (k.c$j - k.cp$j) / k.hm) AS d$j")}
       |  FROM sp_k2 k JOIN sp_hs s USING (user_id)
       |  WHERE k.i BETWEEN 2 AND k.n - 1),
       |$thomasCtes,
       | sp_edge AS (SELECT user_id,
       |   ${percomp(j => s"max(CASE WHEN j = 1 THEN x$j END) AS xa$j")},
       |   ${percomp(j => s"max(CASE WHEN j = 2 THEN x$j END) AS xb$j")},
       |   ${percomp(j => s"max(CASE WHEN j = m THEN x$j END) AS xm$j")},
       |   ${percomp(j => s"max(CASE WHEN j = m - 1 THEN x$j END) AS xn$j")},
       |   max(m) AS m
       |  FROM sp_bwd GROUP BY user_id),
       | sp_m AS MATERIALIZED (
       |  SELECT user_id, j + 1 AS i, ${percomp(j => s"x$j AS m$j")} FROM sp_bwd
       |  UNION ALL
       |  SELECT e.user_id, 1 AS i,
       |   ${percomp(j => s"((s.h1 + s.h2) * e.xa$j - s.h1 * e.xb$j) / s.h2 AS m$j")}
       |   FROM sp_edge e JOIN sp_hs s USING (user_id)
       |  UNION ALL
       |  SELECT e.user_id, e.m + 2 AS i,
       |   ${percomp(j => s"((s.hp + s.hl) * e.xm$j - s.hl * e.xn$j) / s.hp AS m$j")}
       |   FROM sp_edge e JOIN sp_hs s USING (user_id)),
       | sp_q AS ($queriesSql),
       | sp_br AS (SELECT q.user_id, q.tq,
       |   max(o.i) FILTER (WHERE o.t <= q.tq) AS ihit,
       |   max(o.n) AS n, min(o.t) AS t0, max(o.t) AS tn
       |  FROM sp_q q JOIN sp_trk o USING (user_id) GROUP BY q.user_id, q.tq),
       | sp_span AS (SELECT user_id, tq, least(ihit, n - 1) AS ispan
       |  FROM sp_br WHERE tq >= t0 AND tq <= tn)
       | SELECT s.user_id, s.tq,
       |  ${percomp(j =>
           s"""(ma.m$j * u * u * u + mb.m$j * v * v * v) / (6.0 * h)
              |   + (ka.c$j / h - ma.m$j * h / 6.0) * u
              |   + (kb.c$j / h - mb.m$j * h / 6.0) * v AS i$j""".stripMargin)}
       | FROM (SELECT sp.*, ka0.t AS ta, kb0.t AS tb,
       |    kb0.t - ka0.t AS h, kb0.t - sp.tq AS u, sp.tq - ka0.t AS v
       |   FROM sp_span sp
       |   JOIN sp_trk ka0 ON ka0.user_id = sp.user_id AND ka0.i = sp.ispan
       |   JOIN sp_trk kb0 ON kb0.user_id = sp.user_id AND kb0.i = sp.ispan + 1) s
       | JOIN sp_trk ka ON ka.user_id = s.user_id AND ka.i = s.ispan
       | JOIN sp_trk kb ON kb.user_id = s.user_id AND kb.i = s.ispan + 1
       | JOIN sp_m ma ON ma.user_id = s.user_id AND ma.i = s.ispan
       | JOIN sp_m mb ON mb.user_id = s.user_id AND mb.i = s.ispan + 1""".stripMargin
      .replace("\n", " ")
  }

  /** DuckDB-SQL mirror of the quadratic (order-2 B-spline, scipy
    * midpoint knots — [[interpKnots]] / [[bsplineInterpCoefs]] /
    * [[bsplineInterpEval]]) track interpolation with an optional
    * Savitzky-Golay mode='mirror' pre-smooth, for the correctness
    * oracle. The order-2 collocation matrix on midpoint knots is
    * tridiagonal (row i touches coefficients i-1..i+1; the two
    * endpoint rows are exact unit rows), so the same Thomas CTEs as
    * the cubic mirror solve it; basis values unroll the k=2 Cox-de
    * Boor triangle with the solver's own operation order. Knot spans
    * need NO floating comparisons for the sites (span_i =
    * clamp(i, 2, n-1) by construction) and only exact-arithmetic
    * midpoint comparisons for the queries. Savgol coefficients are
    * inlined as literals from [[savgolCoefficients]] — the same
    * doubles the engine multiplies by.
    *
    * Same contract as [[cubicSplineMirrorSql]]; `minFixes` must
    * exceed the smoothing window so the reference's window-truncation
    * rules never fire on a mirrored track.
    */
  def quadraticSplineMirrorSql(fixesSql: String, queriesSql: String,
                               windowLength: Int, polyorder: Int = 2,
                               minFixes: Int = 8): String = {
    require(windowLength % 2 == 1 && minFixes > windowLength && minFixes >= 3)
    def L(x: Double): String = {
      val s = x.toString
      if (s.contains('.') || s.contains('E') || s.contains('e')) s else s + ".0"
    }
    val coeff = savgolCoefficients(windowLength, polyorder)
    val half = windowLength / 2
    // smoothed c_j: taps in ascending-k order (the solver's summation
    // order) with single-reflection 'mirror' indexing into the
    // per-track component list
    def smooth(j: Int): String =
      coeff.zipWithIndex.map { case (c, kk) =>
        val off = kk - half
        val ii = if (off == 0) "o.i" else s"(o.i + ${off})"
        s"${L(c)} * l$j[CASE WHEN $ii < 1 THEN 2 - $ii WHEN $ii > o.n THEN 2 * o.n - $ii ELSE $ii END]"
      }.mkString(" + ")
    // knot(idx) for 0-based B-spline knot index: endpoint clamps plus
    // the midpoint list (mid_j at 1-based list position j)
    def knot(idx: String, p: String): String =
      s"CASE WHEN $idx <= 2 THEN ${p}tf WHEN $idx >= ${p}n THEN ${p}tl ELSE ${p}ml[$idx - 1] END"
    // k=2 Cox-de Boor triangle, matching basisFuns' operation order:
    // t1 = 1/(r1+l1); t2 = (r1*t1)/(r1+l2); t3 = (l1*t1)/(r2+l1);
    // B0 = r1*t2, B1 = l2*t2 + r2*t3, B2 = l1*t3.
    s"""WITH RECURSIVE
       |${orderedCtes(fixesSql, minFixes)},
       | sq_l AS MATERIALIZED (SELECT user_id,
       |   ${percomp(j => s"list(c$j ORDER BY i) AS l$j")},
       |   list((t + lead) / 2.0 ORDER BY i) FILTER (WHERE lead IS NOT NULL) AS ml,
       |   min(t) AS tf, max(t) AS tl, max(n) AS n
       |  FROM (SELECT *, lead(t) OVER (PARTITION BY user_id ORDER BY i) AS lead
       |   FROM sp_trk) GROUP BY user_id),
       | sq_sm AS MATERIALIZED (SELECT o.user_id, o.i, o.n, o.t,
       |   ${percomp(j => s"${smooth(j)} AS c$j")}
       |  FROM sp_trk o JOIN sq_l l USING (user_id)),
       | sq_bas AS (SELECT *,
       |   1.0 / (r1 + l1) AS t1
       |  FROM (SELECT *,
       |    t - k_s AS l1, k_s1 - t AS r1, t - k_sm1 AS l2, k_s2 - t AS r2
       |   FROM (SELECT sm.*,
       |     ${knot("(sp - 1)", "l.")} AS k_sm1, ${knot("sp", "l.")} AS k_s,
       |     ${knot("(sp + 1)", "l.")} AS k_s1, ${knot("(sp + 2)", "l.")} AS k_s2
       |    FROM (SELECT *, greatest(2, least(n - 1, i)) AS sp FROM sq_sm) sm
       |    JOIN sq_l l USING (user_id)))),
       | sp_sys AS MATERIALIZED (SELECT user_id, i AS j, n AS m,
       |   CASE WHEN i = 1 THEN 0.0 WHEN i = n THEN b1v ELSE b0v END AS av,
       |   CASE WHEN i = 1 THEN b0v WHEN i = n THEN b2v ELSE b1v END AS bv,
       |   CASE WHEN i = 1 THEN b1v WHEN i = n THEN 0.0 ELSE b2v END AS cv,
       |   ${percomp(j => s"c$j AS d$j")}
       |  FROM (SELECT *,
       |    r1 * t2 AS b0v, l2 * t2 + r2 * t3 AS b1v, l1 * t3 AS b2v
       |   FROM (SELECT *,
       |     (r1 * t1) / (r1 + l2) AS t2, (l1 * t1) / (r2 + l1) AS t3
       |    FROM sq_bas))),
       |$thomasCtes,
       | sq_cl AS MATERIALIZED (SELECT user_id,
       |   ${percomp(j => s"list(x$j ORDER BY j) AS cl$j")}
       |  FROM sp_bwd GROUP BY user_id),
       | sp_q AS ($queriesSql),
       | sq_span AS (SELECT q.user_id, q.tq,
       |   least(2 + count(*) FILTER (WHERE m.mj BETWEEN 2 AND l.n - 2
       |     AND l.ml[m.mj] <= q.tq), l.n - 1) AS sq, l.n AS n
       |  FROM sp_q q
       |  JOIN sq_l l USING (user_id)
       |  LEFT JOIN (SELECT user_id, unnest(generate_series(1, len(ml))) AS mj
       |    FROM sq_l) m ON m.user_id = q.user_id
       |  WHERE q.tq >= l.tf AND q.tq <= l.tl
       |  GROUP BY q.user_id, q.tq, l.n)
       | SELECT s.user_id, s.tq,
       |  ${percomp(j => s"b0v * cl$j[sq - 1] + b1v * cl$j[sq] + b2v * cl$j[sq + 1] AS i$j")}
       | FROM (SELECT *,
       |   r1 * t2 AS b0v, l2 * t2 + r2 * t3 AS b1v, l1 * t3 AS b2v
       |  FROM (SELECT *,
       |    (r1 * t1) / (r1 + l2) AS t2, (l1 * t1) / (r2 + l1) AS t3
       |   FROM (SELECT *, 1.0 / (r1 + l1) AS t1
       |    FROM (SELECT *,
       |      tq - k_s AS l1, k_s1 - tq AS r1, tq - k_sm1 AS l2, k_s2 - tq AS r2
       |     FROM (SELECT sp.user_id, sp.tq, sp.sq,
       |       ${knot("(sp.sq - 1)", "l.")} AS k_sm1, ${knot("sp.sq", "l.")} AS k_s,
       |       ${knot("(sp.sq + 1)", "l.")} AS k_s1, ${knot("(sp.sq + 2)", "l.")} AS k_s2
       |      FROM sq_span sp JOIN sq_l l USING (user_id)))))) s
       | JOIN sq_cl cc ON cc.user_id = s.user_id""".stripMargin
      .replace("\n", " ")
  }
}
