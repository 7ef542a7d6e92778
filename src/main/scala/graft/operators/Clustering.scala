package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geo.Ellipsoids.MeanEarthRadius

/** Density clustering (DBSCAN) over points on the sphere with a
  * great-circle eps — the "find spatial hot spots / beam clusters"
  * primitive (cf. Ester et al. 1996, deterministic variant).
  *
  * Semantics (all ties broken by MIN id, so the result is a pure
  * function of the input — classic DBSCAN's border assignment is
  * scan-order dependent):
  *  - core: at least `minPts` points within `epsMeters`, COUNTING
  *    the point itself;
  *  - cluster label: the smallest core id reachable through
  *    core-core eps edges (singleton cores label themselves);
  *  - border: non-core with at least one core neighbor — joins the
  *    smallest label among its core neighbors;
  *  - noise: everything else (label null).
  *
  * Scale shape: one [[SpatialJoins.distanceJoin]] self-join (ring-
  * cell equi-join — never all pairs) staged through ONE explicit
  * hash exchange on the left id that all three consumers (degree
  * count, core-core edge filter, border attach) reuse, then
  * [[Dedup.connectedComponents]] (iterative min-label propagation)
  * over core-core edges only. Eps-graphs at training-data scale are
  * sparse and their components are diameter-bounded, so the label
  * loop converges in a handful of iterations.
  */
object Clustering {

  /** @param skewSalt forwarded to the eps self-join ([[SpatialJoins
    *   .distanceJoin]]) for dense-hot-cell inputs.
    *  @return one row per input point: (idCol, cluster, kind) with
    *   kind in core/border/noise and cluster null for noise. The
    *   frame is MATERIALIZED and persisted at MEMORY_AND_DISK (the
    *   intermediate eps graph is released before return) — unpersist
    *   it when done, as with [[Dedup.connectedComponents]].
    */
  def dbscan(points: DataFrame, idCol: String, nvecCol: String,
             epsMeters: Double, minPts: Int,
             sphereRadius: Double = MeanEarthRadius,
             skewSalt: Int = 0): DataFrame = {
    require(epsMeters > 0.0, s"eps must be > 0 (got $epsMeters)")
    require(minPts >= 1, s"minPts must be >= 1 (got $minPts)")
    val ids = points.select(col(idCol), col(nvecCol))
    val left = ids.select(col(idCol).as("__a"), col(nvecCol).as("__an"))
    val right = ids.select(col(idCol).as("__b"), col(nvecCol).as("__bn"))
    // directed eps pairs (both orientations), staged through one
    // exchange: the self-join is the expensive subtree and three
    // branches consume it — without the explicit repartition each
    // branch would re-run the spatial join.
    // PERSISTED, not just exchange-staged: the component resolution
    // below runs its own actions (persist + count + label rounds),
    // so the final output plan would otherwise re-execute the
    // spatial join once per consuming action. The pair list is two
    // ids per eps edge — the neighbor graph, orders of magnitude
    // smaller than the candidate set — and spills to disk if not.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = SpatialJoins
      .distanceJoin(left, right, "__an", "__bn", epsMeters, sphereRadius,
        skewSalt = skewSalt)
      .filter(col("__a") =!= col("__b"))
      .select("__a", "__b")
      .repartition(col("__a"))
      .persist(lvl)
    // minPts <= 1: every point (even isolated ones, which have no
    // pair rows and so never reach the degree frame) is a core.
    // For minPts >= 2 a core necessarily has >= 1 neighbor, so the
    // degree aggregation sees every candidate.
    val cores =
      if (minPts <= 1) ids.select(col(idCol).as("__core"))
      else pairs.groupBy("__a").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") + 1 >= minPts)
        .select(col("__a").as("__core"))
    try {
      val coreEdges = pairs
        .join(cores.withColumnRenamed("__core", "__a"), "__a")
        .join(cores.withColumnRenamed("__core", "__b"), "__b")
        .filter(col("__a") < col("__b"))
      val comp = Dedup.connectedComponents(coreEdges, "__a", "__b")
      val coreLabel = cores
        .join(comp.withColumnRenamed("node", "__core"), Seq("__core"), "left")
        .select(col("__core"),
          coalesce(col("component"), col("__core")).as("__cluster"))
      // border candidates: any point with a core neighbor takes the
      // min neighboring label; for core points the own-component
      // label below wins instead
      val nbrLabel = pairs
        .join(coreLabel.select(col("__core").as("__b"),
          col("__cluster").as("__bc")), "__b")
        .groupBy("__a").agg(min("__bc").as("__nbrCluster"))
      val out = ids.select(col(idCol))
        .join(coreLabel.withColumnRenamed("__core", idCol), Seq(idCol), "left")
        .join(nbrLabel.withColumnRenamed("__a", idCol), Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("__cluster"), col("__nbrCluster")).as("cluster"),
          when(col("__cluster").isNotNull, "core")
            .when(col("__nbrCluster").isNotNull, "border")
            .otherwise("noise").as("kind"))
        .persist(lvl)
      out.count() // materialize before the finally releases the pairs
      comp.unpersist(blocking = false)
      out
    } finally pairs.unpersist(blocking = false)
  }
}
