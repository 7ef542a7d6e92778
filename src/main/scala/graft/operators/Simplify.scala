package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Douglas-Peucker polyline simplification over n-vector tracks —
  * the standard decimation step before track storage/rendering:
  * drop every point that deviates less than `tolRad` from the arc
  * between its retained neighbors.
  *
  * Scale shape: like [[Packing]], the recursion is inherently
  * per-track, so the TRACK is the unit of parallelism — one shuffle
  * on the track key, one JITed kernel call per track over its
  * (ord, x, y, z) points, kept ORDINALS back out (16 B/point in
  * flight; a 100k-fix track is 3.2 MB in one task — the upstream
  * sessionizer bounds track length by contract). No SQL oracle
  * exists for this operator (the argmax-split recursion needs
  * aggregation inside recursion, which SQL recursive CTEs forbid);
  * correctness evidence is the independent reference implementation
  * + deviation-invariant specs in SimplifySpec.
  */
object Simplify {
  private lazy val kernelsClass: Class[_] =
    Class.forName("graft.operators.SimplifyKernels")

  private val ptsType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false))), containsNull = false)

  /** Keep-set of Douglas-Peucker at `tolRad` per track: output
    * (trackCol, ordCol) rows — join back on these keys for payload.
    * Points are ordered by `ordCol` (ties are a caller bug); tracks
    * of 1-2 points pass through whole. Null ord/nvec rows are
    * dropped by contract.
    */
  def douglasPeucker(points: DataFrame, trackCol: String, ordCol: String,
                     nvecCol: String, tolRad: Double): DataFrame = {
    require(tolRad >= 0.0, s"tolerance must be >= 0 (got $tolRad)")
    points.filter(col(ordCol).isNotNull && col(nvecCol).isNotNull)
      .groupBy(trackCol)
      .agg(sort_array(collect_list(struct(
        col(ordCol).cast("long").as("ord"),
        col(nvecCol).getField("x").as("x"),
        col(nvecCol).getField("y").as("y"),
        col(nvecCol).getField("z").as("z")))).as("__pts"))
      .select(col(trackCol),
        explode(org.apache.spark.sql.GraftSqlBridge.staticInvoke(
          kernelsClass, ArrayType(LongType, containsNull = false),
          "douglasPeucker", Seq(col("__pts"), lit(tolRad)),
          Seq(ptsType, DoubleType))).as(ordCol))
  }
}

/** JIT-compiled simplification kernels (StaticInvoke targets). */
object SimplifyKernels {

  /** Great-circle distance [rad] from p to the ARC a->b — the shared
    * CellKernels formulation (foot-on-arc + endpoint fallback +
    * degenerate-edge guard); one implementation for the kernel,
    * polygon boundary distance, and the SQL mirrors.
    */
  @inline private def segDist(px: Double, py: Double, pz: Double,
                              ax: Double, ay: Double, az: Double,
                              bx: Double, by: Double, bz: Double): Double =
    graft.index.CellKernels.segDistRad(px, py, pz, ax, ay, az, bx, by, bz)

  /** Douglas-Peucker keep-set over (ord, x, y, z) entries pre-sorted
    * by ord: iterative split stack, strict `> tol` split rule, kept
    * ords returned ascending. Endpoints always kept.
    */
  def douglasPeucker(entries: ArrayData, tolRad: Double): GenericArrayData = {
    val n = entries.numElements()
    if (n <= 2) {
      val all = new Array[Long](n)
      var i = 0
      while (i < n) { all(i) = entries.getStruct(i, 4).getLong(0); i += 1 }
      return new GenericArrayData(all)
    }
    val ord = new Array[Long](n)
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    val zs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 4)
      ord(i) = e.getLong(0); xs(i) = e.getDouble(1)
      ys(i) = e.getDouble(2); zs(i) = e.getDouble(3)
      i += 1
    }
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi - lo > 1) {
        var best = -1.0
        var bestI = -1
        var j = lo + 1
        while (j < hi) {
          val d = segDist(xs(j), ys(j), zs(j),
            xs(lo), ys(lo), zs(lo), xs(hi), ys(hi), zs(hi))
          if (d > best) { best = d; bestI = j }
          j += 1
        }
        if (best > tolRad) {
          keep(bestI) = true
          stack = (lo, bestI) :: (bestI, hi) :: stack
        }
      }
    }
    var cnt = 0
    i = 0
    while (i < n) { if (keep(i)) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var k = 0
    i = 0
    while (i < n) { if (keep(i)) { out(k) = ord(i); k += 1 }; i += 1 }
    new GenericArrayData(out)
  }
}
