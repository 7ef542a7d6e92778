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
    val cross = pairs.select(aCol, bCol)
      .join(pa, aCol)
      .join(pb, bCol)
      .withColumn("__d", geo.gcDistance(col("__na"), col("__nb"), sphereRadius))
    def directed(srcPt: String): DataFrame = cross
      .groupBy(col(aCol), col(bCol), col(srcPt))
      .agg(min("__d").as("__min"))
      .groupBy(col(aCol), col(bCol))
      .agg(max("__min").as(s"__h$srcPt"))
    directed("__pa").join(directed("__pb"), Seq(aCol, bCol))
      .select(col(aCol), col(bCol),
        greatest(col("__h__pa"), col("__h__pb")).as("hausdorff_m"))
  }
}
