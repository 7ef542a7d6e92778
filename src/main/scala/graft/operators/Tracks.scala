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
    * @param queries (trackCol, tCol) rows (query times)
    * @return queries + interpolated `nvecCol` (null outside the
    *         track's time span)
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

  /** First row of the inverse of a small SPD matrix via Gaussian
    * elimination on [N | I].
    */
  private def solveRow0(n0: Array[Array[Double]]): Array[Double] = {
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
    Array.tabulate(p)(j => a(0)(p + j)) // row 0 of the inverse
  }

  /** Smoothed track positions: per-track Savitzky-Golay over each
    * n-vector component ('nearest' edge padding, the reference
    * default), renormalized to unit length. Distributes per track via
    * typed groups.
    */
  def savgolSmooth(fixes: DataFrame, trackCol: String, tCol: String,
                   nvecCol: String, windowLength: Int, polyorder: Int = 2,
                   mode: String = "nearest"): DataFrame = {
    require(mode == "nearest" || mode == "interp", s"unsupported mode $mode")
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
            var acc = 0.0; var k = 0
            while (k < wl) {
              val idx = math.min(n - 1, math.max(0, i - m + k)) // 'nearest'
              acc += coeff(k) * get(idx)
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
    */
  def courseOverGround(fixes: DataFrame, trackCol: String, tCol: String,
                       nvecCol: String,
                       a: Double = graft.geo.Ellipsoids.WGS84.a,
                       f: Double = graft.geo.Ellipsoids.WGS84.f): DataFrame = {
    val w = Window.partitionBy(trackCol).orderBy(tCol)
    val mid = (u: Column, v: Column) => geo.vunit(geo.vadd(u, v))
    // the bearing goes through one static-call expression node:
    // composed Column math here would re-inline the midpoint structs
    // into an exponentially wide tree (minutes of analyzer/codegen
    // time), while a single static call keeps the plan flat
    fixes
      .withColumn("__prev", lag(col(nvecCol), 1).over(w))
      .withColumn("__next", lead(col(nvecCol), 1).over(w))
      .withColumn("__from", when(col("__prev").isNull, col(nvecCol))
        .otherwise(mid(col("__prev"), col(nvecCol))))
      .withColumn("__to", when(col("__next").isNull, col(nvecCol))
        .otherwise(mid(col(nvecCol), col("__next"))))
      .withColumn("cog",
        when(col("__prev").isNull && col("__next").isNull, lit(Double.NaN))
          .otherwise(geo.azimuthFast(col("__from"), col("__to"), a, f)))
      .drop("__prev", "__next", "__from", "__to")
  }
}
