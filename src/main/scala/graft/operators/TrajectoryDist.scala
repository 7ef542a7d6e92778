package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.geo.Ellipsoids.MeanEarthRadius

/** Trajectory-to-trajectory distances for EXPLICIT track pairs — the
  * verify step of any track-similarity pipeline (candidate pairs come
  * cheap from a cell-level distance join on track summaries; this
  * operator scores them exactly).
  *
  * Discrete Hausdorff: h(A→B) = max over a of min over b of the
  * great-circle distance; the symmetric distance is
  * max(h(A→B), h(B→A)). Relational shape: the pair list joins each
  * side's points by track id (two shuffles on track id — never a
  * points×points join across unrelated tracks), the per-pair cross
  * product is grouped twice (min per source point, then max per
  * pair), and both directions come from the same candidate frame.
  * Cost is Σ_pairs |A|·|B| — the irreducible size of the exact
  * answer's candidate set, confined to LISTED pairs only.
  */
object TrajectoryDist {

  /** @param points  (trackCol, pointCol, nvecCol) — one row per
    *                track point; pointCol is any per-point id used
    *                only to keep distinct points distinct in the
    *                min/max groupings.
    * @param pairs   (aCol, bCol) — track-id pairs to score.
    * @return (aCol, bCol, hausdorff_m)
    */
  def hausdorff(points: DataFrame, trackCol: String, pointCol: String,
                nvecCol: String,
                pairs: DataFrame, aCol: String, bCol: String,
                sphereRadius: Double = MeanEarthRadius): DataFrame = {
    val pa = points.select(col(trackCol).as(aCol), col(pointCol).as("__pa"),
      col(nvecCol).as("__na"))
    val pb = points.select(col(trackCol).as(bCol), col(pointCol).as("__pb"),
      col(nvecCol).as("__nb"))
    // Both directions come from ONE pass over the candidate frame:
    // each cross row fans out into (dir=a, source point __pa) and
    // (dir=b, source point __pb) AFTER the join + distance are
    // computed (the expensive stage runs once, not once per
    // direction); the per-(pair, dir, point) min then combines
    // map-side, so only ~|A|+|B| pre-aggregated rows per pair ever
    // shuffle despite the 2x fan-out.
    pairs.select(aCol, bCol)
      .join(pa, aCol)
      .join(pb, bCol)
      .withColumn("__d", geo.gcDistance(col("__na"), col("__nb"), sphereRadius))
      .select(col(aCol), col(bCol), col("__d"),
        explode(array(
          struct(lit("a").as("__dir"), col("__pa").as("__pt")),
          struct(lit("b").as("__dir"), col("__pb").as("__pt")))).as("__g"))
      .groupBy(col(aCol), col(bCol), col("__g.__dir").as("__dir"),
        col("__g.__pt").as("__pt"))
      .agg(min("__d").as("__min"))
      .groupBy(col(aCol), col(bCol))
      .agg(max(when(col("__dir") === "a", col("__min"))).as("__ha"),
        max(when(col("__dir") === "b", col("__min"))).as("__hb"))
      .select(col(aCol), col(bCol),
        greatest(col("__ha"), col("__hb")).as("hausdorff_m"))
  }

  private val ptsType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ord",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("z",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)

  /** Discrete Frechet distance for explicit track pairs — the
    * ORDER-AWARE companion of [[hausdorff]] (two tracks tracing the
    * same path in opposite directions are Hausdorff-close but
    * Frechet-far). The coupled min-max recursion is inherently
    * sequential, so each pair is ONE JITed kernel call over the two
    * ord-sorted point arrays (O(|A|·|B|) time, O(|B|) memory —
    * upstream sessionization bounds track length by contract); the
    * pair list is the unit of parallelism. SQL oracle: the DP's
    * within-row prefix dependency vanishes when iterated by
    * ANTI-DIAGONALS (diagonal s depends only on s-1 and s-2), which a
    * two-generation recursive CTE expresses — q76's mirror; the
    * independent recursive reference + Frechet >= Hausdorff dominance
    * in TrajectoryRetrievalSpec cover it from a third angle.
    *
    * @return (aCol, bCol, frechet_m)
    */
  def frechet(points: DataFrame, trackCol: String, pointCol: String,
              nvecCol: String,
              pairs: DataFrame, aCol: String, bCol: String,
              sphereRadius: Double = MeanEarthRadius): DataFrame =
    dpDistance(points, trackCol, pointCol, nvecCol, pairs, aCol, bCol,
      sphereRadius, "frechet", "frechet_m")

  /** Dynamic-time-warping distance for explicit track pairs: the SUM
    * of great-circle point costs along the cheapest monotone coupling
    * (dp(i,j) = d(i,j) + min(dp(i-1,j), dp(i-1,j-1), dp(i,j-1))) —
    * the alignment-cost companion of [[frechet]] (which takes the MAX
    * along the coupling; DTW >= Frechet always, spec-pinned). Same
    * execution shape: one JITed rolling-row kernel call per listed
    * pair, pair list = parallelism unit; same anti-diagonal
    * recursive-CTE oracle (q79).
    *
    * @return (aCol, bCol, dtw_m) — dtw_m is the summed cost in
    *         meters (radians x sphereRadius), NOT a per-point mean.
    */
  def dtw(points: DataFrame, trackCol: String, pointCol: String,
          nvecCol: String,
          pairs: DataFrame, aCol: String, bCol: String,
          sphereRadius: Double = MeanEarthRadius): DataFrame =
    dpDistance(points, trackCol, pointCol, nvecCol, pairs, aCol, bCol,
      sphereRadius, "dtw", "dtw_m")

  private def dpDistance(points: DataFrame, trackCol: String, pointCol: String,
                         nvecCol: String,
                         pairs: DataFrame, aCol: String, bCol: String,
                         sphereRadius: Double, method: String,
                         outCol: String): DataFrame = {
    val kernelsClass = Class.forName("graft.operators.TrajectoryKernels")
    val tr = points
      .filter(col(pointCol).isNotNull && col(nvecCol).isNotNull)
      .groupBy(trackCol)
      .agg(sort_array(collect_list(struct(
        col(pointCol).cast("long").as("ord"),
        geo.vx(col(nvecCol)).as("x"),
        geo.vy(col(nvecCol)).as("y"),
        geo.vz(col(nvecCol)).as("z")))).as("__pts"))
    pairs.select(aCol, bCol)
      .join(tr.select(col(trackCol).as(aCol), col("__pts").as("__pa")), aCol)
      .join(tr.select(col(trackCol).as(bCol), col("__pts").as("__pb")), bCol)
      .select(col(aCol), col(bCol),
        (org.apache.spark.sql.GraftSqlBridge.staticInvoke(kernelsClass,
          org.apache.spark.sql.types.DoubleType, method,
          Seq(col("__pa"), col("__pb")), Seq(ptsType, ptsType))
          * lit(sphereRadius)).as(outCol))
  }
}

/** JIT-compiled trajectory kernels (StaticInvoke targets). */
object TrajectoryKernels {

  private def unpack(a: org.apache.spark.sql.catalyst.util.ArrayData,
                     what: String): (Array[Double], Array[Double], Array[Double]) = {
    val n = a.numElements()
    if (n == 0) throw new IllegalArgumentException(s"$what needs non-empty tracks")
    val x = new Array[Double](n); val y = new Array[Double](n)
    val z = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = a.getStruct(i, 4)
      x(i) = e.getDouble(1); y(i) = e.getDouble(2); z(i) = e.getDouble(3)
      i += 1
    }
    (x, y, z)
  }

  /** Great-circle angle [rad] between point i of (ax, ay, az) and
    * point j of (bx, by, bz) — the ONE distance formulation both DP
    * kernels share (they are spec-pinned to satisfy dtw >= frechet,
    * which only holds when the per-pair costs are identical). */
  @inline private def gcRad(
      ax: Array[Double], ay: Array[Double], az: Array[Double], i: Int,
      bx: Array[Double], by: Array[Double], bz: Array[Double], j: Int): Double = {
    val cx = ay(i) * bz(j) - az(i) * by(j)
    val cy = az(i) * bx(j) - ax(i) * bz(j)
    val cz = ax(i) * by(j) - ay(i) * bx(j)
    math.atan2(math.sqrt(cx * cx + cy * cy + cz * cz),
      ax(i) * bx(j) + ay(i) * by(j) + az(i) * bz(j))
  }

  /** Discrete Frechet distance [rad] between two ord-sorted
    * (ord, x, y, z) arrays: rolling-row DP of
    * dp(i,j) = max(d(i,j), min(dp(i-1,j), dp(i-1,j-1), dp(i,j-1))).
    */
  def frechet(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val (ax, ay, az) = unpack(a, "frechet")
    val (bx, by, bz) = unpack(b, "frechet")
    val n = ax.length; val m = bx.length
    def d(i: Int, j: Int): Double = gcRad(ax, ay, az, i, bx, by, bz, j)
    val prev = new Array[Double](m)
    val cur = new Array[Double](m)
    var j = 0
    while (j < m) {
      prev(j) = math.max(if (j == 0) 0.0 else prev(j - 1), d(0, j))
      j += 1
    }
    var i = 1
    while (i < n) {
      cur(0) = math.max(prev(0), d(i, 0))
      j = 1
      while (j < m) {
        val reach = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = math.max(reach, d(i, j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  /** Dynamic-time-warping cost [rad] between two ord-sorted
    * (ord, x, y, z) arrays: rolling-row DP of
    * dp(i,j) = d(i,j) + min(dp(i-1,j), dp(i-1,j-1), dp(i,j-1)),
    * with the standard boundary chains along the first row/column.
    */
  def dtw(a: org.apache.spark.sql.catalyst.util.ArrayData,
          b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val (ax, ay, az) = unpack(a, "dtw")
    val (bx, by, bz) = unpack(b, "dtw")
    val n = ax.length; val m = bx.length
    def d(i: Int, j: Int): Double = gcRad(ax, ay, az, i, bx, by, bz, j)
    val prev = new Array[Double](m)
    val cur = new Array[Double](m)
    var j = 0
    while (j < m) {
      prev(j) = (if (j == 0) 0.0 else prev(j - 1)) + d(0, j)
      j += 1
    }
    var i = 1
    while (i < n) {
      cur(0) = prev(0) + d(i, 0)
      j = 1
      while (j < m) {
        val reach = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = d(i, j) + reach
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }
}
