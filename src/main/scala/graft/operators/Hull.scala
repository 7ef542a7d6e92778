package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Spherical convex hull per group — the footprint/coverage
  * primitive ("which customers delimit this region's service area").
  *
  * Contract: each group must be HEMISPHERIC — every point strictly
  * within 90 deg of the group's normalized centroid (checked, loud
  * failure otherwise; a spherical hull is ill-defined for
  * sphere-spanning sets). Under that contract the gnomonic
  * projection about the centroid maps great circles to straight
  * lines, so the planar convex hull of the projected points IS the
  * spherical hull — computed per group with one monotone-chain
  * kernel call (O(n log n)).
  *
  * Collinear boundary points are KEPT (a point on a hull edge is a
  * hull vertex here) — this matches the relational vertex
  * characterization the oracle uses (exists j such that every k lies
  * on one side of the great circle through i and j, side tests with
  * >= 0). Exact duplicate positions collapse before the chain (they
  * would stall the keep-collinear pop rule) and every id sharing a
  * kept hull position is emitted — a duplicate of a hull vertex is a
  * hull vertex, an interior duplicate never is.
  *
  * Scale shape: like [[Simplify]], the GROUP is the unit of
  * parallelism — one shuffle on the group key, ids + coordinates
  * only (32 B/point in flight), hull ids back out; join back on
  * (group, id) for payload.
  */
object Hull {
  private lazy val kernelsClass: Class[_] =
    Class.forName("graft.operators.HullKernels")

  private val ptsType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false))), containsNull = false)

  /** Hull-vertex ids per group: (groupCol, idCol) rows, ids
    * ascending. Null id/nvec rows are dropped by contract.
    */
  def convexHull(points: DataFrame, groupCol: String, idCol: String,
                 nvecCol: String): DataFrame = {
    import graft.functions.geo
    points.filter(col(idCol).isNotNull && col(nvecCol).isNotNull)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(struct(
        col(idCol).cast("long").as("ord"),
        geo.vx(col(nvecCol)).as("x"),
        geo.vy(col(nvecCol)).as("y"),
        geo.vz(col(nvecCol)).as("z")))).as("__pts"))
      .select(col(groupCol),
        explode(org.apache.spark.sql.GraftSqlBridge.staticInvoke(
          kernelsClass, ArrayType(LongType, containsNull = false),
          "convexHullIds", Seq(col("__pts")), Seq(ptsType))).as(idCol))
  }
}

/** JIT-compiled hull kernels (StaticInvoke targets). */
object HullKernels {

  /** Hull-vertex ords of a hemispheric point set, ascending.
    * Gnomonic projection about the normalized centroid, then a
    * monotone chain KEEPING collinear boundary points (pop rule
    * strictly-negative cross). 1-2 points are their own hull.
    */
  def convexHullIds(entries: ArrayData): GenericArrayData = {
    val n = entries.numElements()
    val ord = new Array[Long](n)
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    val zs = new Array[Double](n)
    var i = 0
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    while (i < n) {
      val e = entries.getStruct(i, 4)
      ord(i) = e.getLong(0); xs(i) = e.getDouble(1)
      ys(i) = e.getDouble(2); zs(i) = e.getDouble(3)
      cx += xs(i); cy += ys(i); cz += zs(i)
      i += 1
    }
    if (n <= 2) return new GenericArrayData(ord.clone())
    val cn = math.sqrt(cx * cx + cy * cy + cz * cz)
    if (cn < 1e-12)
      throw new IllegalArgumentException(
        "hull group has a degenerate (near-zero) centroid — not hemispheric")
    cx /= cn; cy /= cn; cz /= cn
    // orthonormal basis perpendicular to the centroid
    val (ax, ay, az) =
      if (math.abs(cx) <= math.abs(cy) && math.abs(cx) <= math.abs(cz))
        (1.0, 0.0, 0.0)
      else if (math.abs(cy) <= math.abs(cz)) (0.0, 1.0, 0.0)
      else (0.0, 0.0, 1.0)
    var e1x = ay * cz - az * cy
    var e1y = az * cx - ax * cz
    var e1z = ax * cy - ay * cx
    val e1n = math.sqrt(e1x * e1x + e1y * e1y + e1z * e1z)
    e1x /= e1n; e1y /= e1n; e1z /= e1n
    val e2x = cy * e1z - cz * e1y
    val e2y = cz * e1x - cx * e1z
    val e2z = cx * e1y - cy * e1x
    // gnomonic coords; hemispheric contract enforced here
    val us = new Array[Double](n); val vs = new Array[Double](n)
    i = 0
    while (i < n) {
      val d = xs(i) * cx + ys(i) * cy + zs(i) * cz
      if (d <= 1e-9)
        throw new IllegalArgumentException(
          s"hull group is not hemispheric: point ord=${ord(i)} lies " +
            ">= 90 deg from the group centroid — split the group")
      us(i) = (xs(i) * e1x + ys(i) * e1y + zs(i) * e1z) / d
      vs(i) = (xs(i) * e2x + ys(i) * e2y + zs(i) * e2z) / d
      i += 1
    }
    // DISTINCT positions only go through the chain: adjacent exact
    // duplicates make every cross() with them zero, which stalls the
    // keep-collinear (strictly-negative) pop rule and leaks interior
    // points. Every ord sharing a kept hull position is emitted ("a
    // duplicate of a hull vertex is a hull vertex").
    val sorted = Array.range(0, n).sortBy(j => (us(j), vs(j)))
    val idxB = Array.newBuilder[Int]
    i = 0
    while (i < n) {
      if (i == 0 || us(sorted(i)) != us(sorted(i - 1)) ||
        vs(sorted(i)) != vs(sorted(i - 1))) idxB += sorted(i)
      i += 1
    }
    val idx = idxB.result()
    val m = idx.length
    if (m == 1) {
      // all positions coincide: every ord is the hull
      val all = ord.clone().sorted
      return new GenericArrayData(all)
    }
    def cross(o: Int, a: Int, b: Int): Double =
      (us(a) - us(o)) * (vs(b) - vs(o)) - (vs(a) - vs(o)) * (us(b) - us(o))
    val hull = new Array[Int](2 * m)
    var k = 0
    // lower chain
    i = 0
    while (i < m) {
      val j = idx(i)
      while (k >= 2 && cross(hull(k - 2), hull(k - 1), j) < 0) k -= 1
      hull(k) = j; k += 1
      i += 1
    }
    // upper chain
    val lower = k + 1
    i = m - 2
    while (i >= 0) {
      val j = idx(i)
      while (k >= lower && cross(hull(k - 2), hull(k - 1), j) < 0) k -= 1
      hull(k) = j; k += 1
      i -= 1
    }
    // last point repeats the first; collect every ord at a kept
    // position (collinear-kept chains can also visit a vertex twice)
    val keptPos = scala.collection.mutable.HashSet.empty[(Double, Double)]
    i = 0
    while (i < k - 1) { keptPos += ((us(hull(i)), vs(hull(i)))); i += 1 }
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < n) {
      if (keptPos.contains((us(i), vs(i)))) set.add(ord(i))
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
