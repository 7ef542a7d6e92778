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
}
