package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.geo
import graft.index.{CellIndex, cells}
import graft.geo.{Ellipsoids, Gade, Vec3, VecMath}

/** Spatial join operators: all are cell-index candidate generation
  * (equi-join, shuffle on cell id) followed by exact geodesic
  * verification — the candidate -> verify -> select pattern
  * (SURVEY.md §3 EP-3). No custom physical operators: the planner
  * keeps choosing broadcast vs shuffled hash vs sort-merge, AQE keeps
  * handling stragglers, and every filter stays codegen'd.
  */
object SpatialJoins {
  import Ellipsoids.MeanEarthRadius

  /** An area-of-interest polygon given as (latDeg, lonDeg) vertices
    * (implicitly closed, any orientation, smaller than a hemisphere).
    */
  final case class Aoi(id: String, vertsLatLonDeg: Seq[(Double, Double)]) {
    lazy val vertsN: Array[Vec3] = vertsLatLonDeg.map { case (la, lo) =>
      Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
    }.toArray
    lazy val centroid: Vec3 = VecMath.unit(vertsN.reduce(_ + _))
    /** Circumscribed angular radius around the centroid [rad]. */
    lazy val circumAngle: Double =
      vertsN.map(v => Gade.greatCircleDistanceRad(centroid, v)).max
    def flatVerts: Array[Double] = vertsN.flatMap(v => Array(v.x, v.y, v.z))
  }

  /** Distance join: all (left, right) pairs with great-circle distance
    * <= radiusMeters. Columns of both inputs are preserved (names must
    * be disjoint) plus `distCol`. Level is chosen so one ring of
    * neighbor cells covers the radius; each right row keeps exactly
    * one cell while left probes its ring, so no pair dedup is needed.
    */
  def distanceJoin(left: DataFrame, right: DataFrame,
                   leftNvec: String, rightNvec: String,
                   radiusMeters: Double,
                   sphereRadius: Double = MeanEarthRadius,
                   distCol: String = "dist_m",
                   broadcastRight: Boolean = false,
                   skewSalt: Int = 0,
                   hotCellThreshold: Long = 1000000L): DataFrame = {
    val level = CellIndex.levelForRadius(radiusMeters / sphereRadius)
    val probes0 = left.withColumn("__cell",
      explode(cells.ringCells(cells.cellAt(col(leftNvec), level), 1)))
    val build0 = right.withColumn("__cell", cells.cellAt(col(rightNvec), level))
    val (probes, build1) =
      if (skewSalt <= 1) (probes0.withColumn("__salt", lit(0)),
        build0.withColumn("__salt", lit(0)))
      else {
        // heavy-hitter pre-pass on the probe side: AQE can split skewed
        // shuffle partitions but not one giant key, so hot cells get a
        // per-row salt while the build side replicates only those
        // cells x skewSalt (north_rule "salted repartitioning of hot
        // cells")
        val hot = probes0.groupBy("__cell").count()
          .filter(col("count") >= hotCellThreshold)
          .collect().map(_.getLong(0))
        val hotSet = hot.toSet
        val isHot = (c: Column) =>
          if (hotSet.isEmpty) lit(false) else c.isInCollection(hotSet)
        val p = probes0.withColumn("__salt",
          when(isHot(col("__cell")),
            pmod(xxhash64(geo.vx(col(leftNvec))), lit(skewSalt)).cast("int"))
            .otherwise(lit(0)))
        val b = build0.withColumn("__salt",
          explode(when(isHot(col("__cell")),
            sequence(lit(0), lit(skewSalt - 1)))
            .otherwise(array(lit(0)))))
        (p, b)
      }
    val build = if (broadcastRight) broadcast(build1) else build1
    probes.join(build, Seq("__cell", "__salt"))
      .withColumn(distCol, geo.gcDistance(col(leftNvec), col(rightNvec), sphereRadius))
      .filter(col(distCol) <= radiusMeters)
      .drop("__cell", "__salt")
  }

  /** k-nearest-neighbor join with iterative cell-ring expansion and
    * exact re-ranking.
    *
    * Per query row: candidates from successively wider rings around
    * the query's cell; a query is complete once it has k candidates
    * whose k-th distance lies inside the ring's guaranteed coverage
    * radius (so nothing closer can hide in an unprobed cell). The rare
    * remainder (isolated queries in sparse regions) falls back to a
    * brute-force pass. Output: query columns + data columns + distCol
    * + `rank` (1..k, ties broken by data id for determinism).
    *
    * @param level cell level; pass <= 0 to auto-size from data count
    *              so a cell holds ~2k points on average.
    */
  def knnJoin(queries: DataFrame, data: DataFrame,
              qNvec: String, dNvec: String, qId: String, dId: String,
              k: Int, level: Int = -1,
              sphereRadius: Double = MeanEarthRadius,
              rings: Seq[Int] = Seq(1, 4, 16),
              distCol: String = "dist_m",
              bruteForceThreshold: Long = 2000000L,
              geodesicReRank: Boolean = false): DataFrame = {
    val w = Window.partitionBy(qId).orderBy(col(distCol), col(dId))

    // candidate selection always uses the spherical metric (the ring
    // coverage proof is spherical); with geodesicReRank the final
    // ordering re-ranks a 3k-deep candidate pool by the exact Karney
    // ellipsoidal distance (flattening can only reorder near-ties, so
    // a 3x pool keeps the top-k exact for terrestrial flattenings)
    def rank(cand: DataFrame): DataFrame = {
      val gcRanked = cand
        .withColumn(distCol, geo.gcDistance(col(qNvec), col(dNvec), sphereRadius))
        .withColumn("rank", row_number().over(w))
      if (!geodesicReRank) gcRanked.filter(col("rank") <= k)
      else {
        val wG = Window.partitionBy(qId).orderBy(col("geodesic_m"), col(dId))
        gcRanked.filter(col("rank") <= 3 * k)
          .withColumn("geodesic_m", geo.geodesicDistance(
            geo.lat(col(qNvec)), geo.lon(col(qNvec)),
            geo.lat(col(dNvec)), geo.lon(col(dNvec))))
          .withColumn("rank", row_number().over(wG))
          .filter(col("rank") <= k)
      }
    }

    val dataCount = data.count()
    // cost guard: a broadcast nested-loop pass materializes Q x D
    // candidate rows — only cheaper than the ring machinery when that
    // product is small (and the data side must fit a broadcast)
    if (dataCount <= 100000 && dataCount * queries.count() <= bruteForceThreshold) {
      return rank(queries.crossJoin(broadcast(data)))
    }
    val lvl =
      if (level > 0) level
      else {
        val n = math.max(1L, dataCount)
        // ~2k points per cell: 6 * 4^L cells; N / (6*4^L) = 2k
        val cellsWanted = math.max(1.0, n.toDouble / math.max(1, 2 * k))
        val l = (math.log(cellsWanted / 6.0) / math.log(4.0)).ceil.toInt
        math.max(1, math.min(CellIndex.MaxLevel, l))
      }
    val d = data.withColumn("__cell", cells.cellAt(col(dNvec), lvl))

    var remaining = queries
    var done: List[DataFrame] = Nil
    for (r <- rings if !remaining.isEmpty) {
      val cand = rank(
        remaining.withColumn("__cell",
          explode(cells.ringCells(cells.cellAt(col(qNvec), lvl), r)))
          .join(d, "__cell").drop("__cell"))
        .localCheckpoint(true)
      // guaranteed coverage: r rings of cells at least minCellAngle wide
      val coverage = r * CellIndex.minCellAngle(lvl) * sphereRadius
      val satisfied = cand.groupBy(qId)
        .agg(count(lit(1)).as("__n"), max(col(distCol)).as("__kth"))
        .filter(col("__n") >= k && col("__kth") <= coverage)
        .select(qId)
      done ::= cand.join(satisfied, Seq(qId), "left_semi")
      remaining = remaining.join(satisfied, Seq(qId), "left_anti")
        .localCheckpoint(true)
    }
    if (!remaining.isEmpty) {
      // brute-force fallback for sparse stragglers
      done ::= rank(remaining.crossJoin(d.drop("__cell")))
    }
    done.reduce(_ unionByName _)
  }

  /** Assign points to AOI polygons: cell prefilter (broadcast cover
    * map) then exact point-in-polygon winding test. Output: point
    * columns + `aoi_id` (inner join semantics — points in no AOI drop
    * out; use a later left join on the result for audits).
    */
  def aoiJoin(points: DataFrame, pointNvec: String, aois: Seq[Aoi]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    require(aois.nonEmpty)
    // coarsest level at which every AOI's circumdisc fits a 1-ring
    val level = aois.map(a => CellIndex.levelForRadius(
      math.max(a.circumAngle, 1e-6))).min
    val cover: Seq[(Long, String)] = aois.flatMap { a =>
      val cCell = CellIndex.cellAt(a.centroid.x, a.centroid.y, a.centroid.z, level)
      val kk = math.ceil(a.circumAngle / CellIndex.minCellAngle(level)).toInt + 1
      CellIndex.ring(cCell, kk).map(c => (c, a.id))
    }
    val coverDf = broadcast(cover.toDF("__cell", "aoi_id"))
    val vertsDf = broadcast(aois.map(a => (a.id, a.flatVerts)).toDF("aoi_id", "__verts"))
    points.withColumn("__cell", cells.cellAt(col(pointNvec), level))
      .join(coverDf, "__cell")
      .join(vertsDf, "aoi_id")
      .filter(cells.pointInPolygon(col(pointNvec), col("__verts")))
      .drop("__cell", "__verts")
  }
}
