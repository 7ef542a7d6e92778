package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
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
    /** Enforce the winding disambiguator's validity region (see
      * CellKernels.pointInPolygon): every vertex — hence, for a
      * geodesically convex cap, the whole boundary and interior —
      * within 90 deg of the vertex centroid. Near-hemispheric slivers
      * would get silently wrong containment answers otherwise.
      */
    def validated: Aoi = {
      require(circumAngle < math.Pi / 2,
        f"AOI '$id' spans $circumAngle%.3f rad from its vertex centroid " +
          "(>= pi/2): exceeds the winding test's hemisphere contract — " +
          "split the polygon")
      this
    }
  }

  /** A multipolygon / polygon-with-holes area of interest: a LIST of
    * (latDeg, lonDeg) rings (each implicitly closed, any orientation,
    * each smaller than a hemisphere). Containment is EVEN-ODD over
    * the rings — outer-with-holes, disjoint parts, and
    * islands-in-lakes all fall out of parity with no orientation or
    * nesting bookkeeping, which is also what makes the predicate
    * SQL-mirrorable ring by ring.
    */
  final case class AoiM(id: String, ringsLatLonDeg: Seq[Seq[(Double, Double)]]) {
    require(ringsLatLonDeg.nonEmpty, s"AOI '$id' has no rings")
    ringsLatLonDeg.zipWithIndex.foreach { case (r, i) =>
      require(r.length >= 3, s"AOI '$id' ring $i has ${r.length} vertices (< 3)") }
    lazy val ringsN: Seq[Array[Vec3]] = ringsLatLonDeg.map(_.map { case (la, lo) =>
      Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
    }.toArray)
    /** Per-ring vertex centroids / circumscribed angular radii — the
      * cover machinery prunes per RING (a multipolygon's parts may be
      * arbitrarily far apart; only each ring must fit a hemisphere).
      */
    lazy val ringCentroids: Seq[Vec3] = ringsN.map(r => VecMath.unit(r.reduce(_ + _)))
    lazy val ringCircumAngles: Seq[Double] = ringsN.indices.map { i =>
      ringsN(i).map(v => Gade.greatCircleDistanceRad(ringCentroids(i), v)).max
    }
    /** Ring-list encoding [k, n_0..n_{k-1}, coords...] (all doubles). */
    def flatRings: Array[Double] = {
      val header = ringsN.length.toDouble +: ringsN.map(_.length.toDouble)
      (header ++ ringsN.flatMap(_.flatMap(v => Seq(v.x, v.y, v.z)))).toArray
    }
    /** Hemisphere contract: each ring within 90 deg of its OWN vertex
      * centroid — the per-ring winding disambiguator's validity
      * region, and (geodesic balls of radius < pi/2 being convex)
      * the guarantee that each ring's interior stays inside its own
      * circumdisc, which is what the per-ring cover prunes with. No
      * GLOBAL span limit: a multipolygon's parts may be antipodal.
      */
    def validated: AoiM = {
      ringsLatLonDeg.indices.foreach { i =>
        require(ringCircumAngles(i) < math.Pi / 2,
          f"AOI '$id' ring $i spans ${ringCircumAngles(i)}%.3f rad from its " +
            "vertex centroid (>= pi/2): exceeds the winding test's " +
            "hemisphere contract — split the ring")
      }
      this
    }
  }

  /** Distance join: all (left, right) pairs with great-circle distance
    * <= radiusMeters. Columns of both inputs are preserved (names must
    * be disjoint) plus `distCol`. (level, ring k) are chosen so the
    * k-ring block PROVABLY covers the radius for every query position,
    * including blocks overhanging cube-face edges where the gnomonic
    * projection compresses (CellIndex.coverageLowerBound); each right
    * row keeps exactly one cell while left probes its ring, so no pair
    * dedup is needed. Radii beyond what any block can cover (~0.26 rad
    * ~ 1660 km) switch to per-row quadtree DISC COVERS at a coarse
    * level (still pruning, still provably complete); only caps
    * spanning most of the sphere — where the output itself is
    * quadratic and pruning cannot help — take the exact-filtered
    * cross join.
    */
  /** @param probeSideBloom when true, the ring-exploded probe rows
    *   are prefiltered by a Bloom filter over the build side's
    *   OCCUPIED cells before the shuffle. At low cell occupancy
    *   (build rows << cells in reach) most exploded rows target an
    *   empty cell and would ride the exchange for nothing — the
    *   probe-side explode factor (2k+1)^2 dominates the join cost
    *   there, and the bloom cuts it to ~occupied hits. False
    *   positives only ADD candidates (the exact distance filter
    *   still decides); false negatives cannot occur, so results are
    *   unchanged. Costs one extra pass over the build side (cheap
    *   when the caller has it persisted) — leave off for small or
    *   broadcast builds.
    */
  def distanceJoin(left: DataFrame, right: DataFrame,
                   leftNvec: String, rightNvec: String,
                   radiusMeters: Double,
                   sphereRadius: Double = MeanEarthRadius,
                   distCol: String = "dist_m",
                   broadcastRight: Boolean = false,
                   skewSalt: Int = 0,
                   hotCellThreshold: Long = 1000000L,
                   sampleCellFraction: Double = 0.001,
                   probeSideBloom: Boolean = false): DataFrame = {
    val angle = radiusMeters / sphereRadius
    require(radiusMeters >= 0 && angle <= math.Pi,
      s"radiusMeters=$radiusMeters out of range for sphereRadius=$sphereRadius")
    // Two provably-complete cover families compete on the BLOCK
    // FRACTION metric (expected candidate volume per (probe, build)
    // pair under roughly uniform density, as a fraction of a face):
    //
    //  - ring plans (level, k): probe explodes its cell's (2k+1)^2
    //    Chebyshev block, level the finest levelForRadiusSafe proves
    //    against worst-case gnomonic compression. Fraction
    //    (2k+1)^2 / 4^level. Cheap per probe row (fixed explode, one
    //    ring kernel), but face-corner distortion forces COARSE
    //    provable levels: 600 km proves only k=3/level 4 = 49/256 of
    //    a face per probe.
    //  - the per-row quadtree DISC COVER: probe explodes the cells
    //    whose safe lower-bound distance is within the radius
    //    (cells.capCells — complete at ANY radius, not just beyond
    //    the ring family's ~0.26 rad ceiling), at a level sized so a
    //    cap covers ~48 cells. Fraction ~ (cap area + boundary slop)
    //    / cell area / 4^level — for radii whose provable ring level
    //    is far coarser than the radius-matched level this is many
    //    times tighter (600 km: ~0.03 vs 0.19, measured 2.5 s -> 0.6 s
    //    on the 15k-point sf0.1 dbscan pair join).
    //
    // The cap cover pays a quadtree descent per probe row and a
    // larger explode factor, so it must win the fraction metric by
    // 2x before it is chosen; both plans produce each (probe, build)
    // pair at most once (distinct cover cells vs single build cell),
    // and the exact distance filter decides membership either way —
    // the choice moves only cost. Only when the cap spans most of
    // the sphere — where matching pairs are a constant fraction of
    // |L| x |R| and the OUTPUT is quadratic — does the
    // exact-filtered cross join remain.
    val ringPlan = (1 to 4).flatMap { k =>
        val l = CellIndex.levelForRadiusSafe(angle, k)
        if (l >= 0) Some((l, k)) else None
      }
      .sortBy { case (l, k) =>
        ((2.0 * k + 1) * (2.0 * k + 1) / math.pow(4.0, l), k) }
      .headOption
    val capFrac = (1.0 - math.cos(angle)) / 2.0
    val capPlan: Option[Int] =
      if (capFrac > 0.7 || capFrac <= 0.0) None
      else Some(math.max(1, math.min(CellIndex.MaxLevel,
        (math.log(8.0 / capFrac) / math.log(4.0)).floor.toInt)))
    def capBlockFrac(lvl: Int): Double = {
      // expected cap cells = area term + perimeter/corner slop
      val areaCells = capFrac * 6.0 * math.pow(4.0, lvl)
      (areaCells + 4.0 * math.sqrt(areaCells) + 4.0) / math.pow(4.0, lvl)
    }
    val useCap = capPlan.isDefined && (ringPlan.isEmpty ||
      capBlockFrac(capPlan.get) * 2.0 <
        { val (l, k) = ringPlan.get; (2.0 * k + 1) * (2.0 * k + 1) / math.pow(4.0, l) })
    if (ringPlan.isEmpty && capPlan.isEmpty) {
      val b = if (broadcastRight) broadcast(right) else right
      return left.crossJoin(b)
        .withColumn(distCol, geo.gcDistance(col(leftNvec), col(rightNvec), sphereRadius))
        .filter(col(distCol) <= radiusMeters)
    }
    val level = if (useCap) capPlan.get else ringPlan.get._1
    def coverOf(n: Column): Column =
      if (useCap) cells.capCells(n, level, angle)
      else cells.ringCells(cells.cellAt(n, level), ringPlan.get._2)
    val probesAll = left.withColumn("__cell", explode(coverOf(col(leftNvec))))
    val build0 = right.withColumn("__cell", cells.cellAt(col(rightNvec), level))
    val probes0 =
      if (!probeSideBloom) probesAll
      else {
        // sized from an exact build count (one cheap job, opt-in);
        // 2% fpp keeps the filter ~1.1 B/row while letting through
        // only a trickle of empty-cell probes. An empty build side
        // NPEs Spark's bloom aggregate — and matches nothing anyway.
        val bn = build0.count()
        if (bn == 0L) probesAll.filter(lit(false))
        else {
          val bf = build0.stat.bloomFilter("__cell", math.max(1000L, bn), 0.02)
          val might = udf((c: Long) => bf.mightContainLong(c))
          probesAll.filter(might(col("__cell")))
        }
      }
    val (probes, build1) =
      if (skewSalt <= 1) (probes0.withColumn("__salt", lit(0)),
        build0.withColumn("__salt", lit(0)))
      else {
        // heavy-hitter detection on a BOUNDED SAMPLE of the probe side:
        // AQE can split skewed shuffle partitions but not one giant
        // key, so hot cells get a per-row salt while the build side
        // replicates only those cells x skewSalt (north_rule "salted
        // repartitioning of hot cells"). Sampling BEFORE the ring
        // explode keeps the pre-pass a column-pruned 0.1% scan + tiny
        // agg instead of a full groupBy over every probe row (at
        // 100 TB the full pre-pass doubled the probe-side scan): a
        // cell with >= hotCellThreshold rows appears >= threshold *
        // frac times in expectation, and the detection cut at HALF
        // that count makes a miss exponentially unlikely (Chernoff:
        // P[Binomial(1e6, 1e-3) < 500] < 1e-70). Detection only
        // steers COST (which cells get salted), never correctness —
        // the join result is identical for any hot set, so sampling
        // noise can only under- or over-salt a borderline-warm cell.
        val frac = math.min(1.0, math.max(
          sampleCellFraction, 1000.0 / math.max(1.0, hotCellThreshold.toDouble)))
        val sampleCut = math.max(2L, (hotCellThreshold * frac / 2.0).toLong)
        val hot = left.sample(withReplacement = false, frac, seed = 42L)
          .select(explode(coverOf(col(leftNvec))).as("__cell"))
          .groupBy("__cell").count()
          .filter(col("count") >= sampleCut)
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
    * Per query row: candidates from successively wider blocks around
    * the query's cell; a query is complete once it has k candidates
    * whose k-th distance lies inside the block's EXACT per-query
    * coverage radius (CellIndex.ringCoverageRad — accounts for
    * gnomonic compression at cube-face edges, so nothing closer can
    * hide in an unprobed cell). Queries left unsatisfied (sparse
    * regions) escalate to COARSER levels via parent-cell arithmetic —
    * never a cross join against the data side — ending in a
    * full-sphere wrap block whose coverage is pi, which closes the
    * proof for every query. Output: query columns + data columns +
    * distCol + `rank` (1..k, ties broken by data id for determinism).
    *
    * Each round's candidate set and the straggler chain are persisted
    * MEMORY_AND_DISK (recomputable on executor loss, unlike
    * localCheckpoint) and explicitly unpersisted once the final result
    * is materialized.
    *
    * @param level cell level; pass <= 0 to auto-size from data count
    *              so a cell holds ~2k points on average.
    */
  def knnJoin(queries: DataFrame, data: DataFrame,
              qNvec: String, dNvec: String, qId: String, dId: String,
              k: Int, level: Int = -1,
              sphereRadius: Double = MeanEarthRadius,
              distCol: String = "dist_m",
              bruteForceThreshold: Long = 2000000L,
              geodesicReRank: Boolean = false): DataFrame = {
    val w = Window.partitionBy(qId).orderBy(col(distCol), col(dId))
    // partition-wide stats window: same hash partitioning as `w`, so
    // chaining it after the rank window adds no exchange and no sort
    val wStat = Window.partitionBy(qId)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    // a spherical coverage radius only bounds GEODESIC distances after
    // deflation: the n-vector angle theta between two points satisfies
    // theta <= s / R_min (the normal turns at most 1/R_min radians per
    // meter of path, R_min = min radius of curvature = the meridional
    // M at the equator = a(1-f)^2), so geodesic s >= theta * a(1-f)^2
    // = gc_m * (a(1-f)^2 / sphereRadius). The previous factor (1 - f)
    // alone was NOT a sound bound: R*(1-f) ~ 6349.7 km exceeds
    // a(1-f)^2 ~ 6335.4 km, so an equatorial meridional near-tie
    // could beat the certified coverage by up to 0.22%.
    val covDeflate =
      if (geodesicReRank) {
        val e = graft.geo.Ellipsoids.WGS84
        e.a * (1.0 - e.f) * (1.0 - e.f) / sphereRadius
      } else 1.0

    // candidate selection always uses the spherical metric (the block
    // coverage proof is spherical); with geodesicReRank the final
    // ordering re-ranks by the exact Karney ellipsoidal distance over
    // a PROVABLY sufficient pool (see reRankGeodesic)
    def rank(cand: DataFrame): DataFrame = {
      val gcRanked = cand
        .withColumn(distCol, geo.gcDistance(col(qNvec), col(dNvec), sphereRadius))
        .withColumn("rank", row_number().over(w))
      if (!geodesicReRank) gcRanked.filter(col("rank") <= k)
      else reRankGeodesic(gcRanked)
    }

    /** Exact ellipsoidal re-rank with a provable pool cut. A geodesic
      * distance is bounded below by the deflated spherical one
      * (geodesic >= gc * covDeflate with covDeflate = a(1-f)^2 / R —
      * see covDeflate's derivation; NOT the naive (1 - f), which is
      * unsound), the same bound the ring coverage test uses, so:
      *
      *  1. rank the first 3k spherical candidates by exact geodesic;
      *     their k-th geodesic `__gk1` is an UPPER bound on the true
      *     k-th (the pool is a valid candidate set of >= k rows
      *     whenever the partition has >= k rows);
      *  2. any candidate with gc * covDeflate > __gk1 has geodesic
      *     > __gk1 >= true k-th and is provably outside the top-k;
      *     every other candidate gets the exact geodesic and enters
      *     the final rank.
      *
      * The second tier is almost always empty (flattening only
      * reorders near-ties, so the 3k pool already contains the cut),
      * but the cut is what makes the result EXACT for any
      * distribution, not heuristic. All windows share the qId hash
      * partitioning — one exchange, extra sorts only.
      */
    def reRankGeodesic(gcRanked: DataFrame): DataFrame = {
      val geodExpr = geo.geodesicDistance(
        geo.lat(col(qNvec)), geo.lon(col(qNvec)),
        geo.lat(col(dNvec)), geo.lon(col(dNvec)))
      val wG1 = Window.partitionBy(qId)
        .orderBy(col("__g1").asc_nulls_last, col(dId))
      val wG = Window.partitionBy(qId)
        .orderBy(col("geodesic_m").asc_nulls_last, col(dId))
      gcRanked
        .withColumn("__g1", when(col("rank") <= 3 * k, geodExpr))
        .withColumn("__rg1", row_number().over(wG1))
        .withColumn("__gk1", max(when(col("__rg1") <= k, col("__g1"))).over(wStat))
        .withColumn("geodesic_m",
          when(col("__g1").isNotNull, col("__g1"))
            .otherwise(when(col(distCol) * covDeflate <= col("__gk1"), geodExpr)))
        .withColumn("rank", row_number().over(wG))
        .filter(col("rank") <= k && col("geodesic_m").isNotNull)
        .drop("__g1", "__rg1", "__gk1")
    }

    /** rank() plus the per-query satisfaction stats folded into the
      * SAME window shuffle (no separate groupBy + semi join): `__cnt`
      * = candidate count in this block, `__kth` = the worst kept
      * distance in the FINAL metric (geodesic when re-ranking — the
      * coverage test must bound the metric that orders the output).
      */
    def rankWithStats(cand: DataFrame): DataFrame = {
      // __cnt uses the rank window's spec with an unbounded frame, so
      // both land in ONE WindowExec (one exchange, one sort)
      val wAllOrd = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val gcRanked = cand
        .withColumn(distCol, geo.gcDistance(col(qNvec), col(dNvec), sphereRadius))
        .withColumn("rank", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(wAllOrd))
      val top =
        if (!geodesicReRank) gcRanked.filter(col("rank") <= k)
        else reRankGeodesic(gcRanked)
      // child is already hash-partitioned and qId-clustered: no
      // exchange, no sort for the unordered stats window
      top.withColumn("__kth",
        max(col(if (geodesicReRank) "geodesic_m" else distCol)).over(wStat))
    }

    // Size estimates from catalyst statistics — metadata only, never a
    // job over the data (a count() pre-pass would add a full-table
    // scan per call at 100 TB). rowCount when the plan provides it,
    // else sizeInBytes / row width; both only steer COST choices
    // (brute-force guard, auto level), never correctness.
    def estRows(df: DataFrame): Long = {
      val plan = df.queryExecution.optimizedPlan
      plan.stats.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
        val width = math.max(8L, plan.schema.map(_.dataType.defaultSize).sum.toLong)
        (plan.stats.sizeInBytes.min(BigInt(Long.MaxValue)) / width).toLong
      }
    }
    // stats-derived estimates can sit near Long.MaxValue (sizeInBytes
    // fallback), so pair budgets must be compared without overflow: a
    // wrapped product could falsely pass the <= threshold test and
    // unleash the Q x D path on an enormous side
    def pairBudgetOk(a: Long, b: Long, budget: Long): Boolean =
      a <= budget && b <= budget &&
        (BigInt(math.max(1L, a)) * BigInt(math.max(1L, b))) <= BigInt(budget)
    val dataCount = estRows(data)
    val dataBytes = data.queryExecution.optimizedPlan.stats.sizeInBytes
    // cost guard: a broadcast nested-loop pass materializes Q x D
    // candidate rows — only cheaper than the ring machinery when that
    // product is small (and the data side must fit a broadcast)
    if (dataCount <= 100000 && dataBytes <= (64L << 20) &&
        pairBudgetOk(dataCount, estRows(queries), bruteForceThreshold)) {
      return rank(queries.crossJoin(broadcast(data)))
    }
    val lvl =
      if (level > 0) level
      else {
        val n = math.max(1L, dataCount)
        // target ~2.5 points per cell (a first 3x3 ring then holds
        // ~23 candidates) — the measured optimum at the 1M and 4M
        // probes and the sf0.1 gate; for large k keep ~k/4 per cell
        // so the first ring can still satisfy. Cells go 4x per level,
        // so ROUND to the nearest level: rounding coarse multiplies
        // the rank-window volume 4x for every query, rounding fine
        // only sends a few sparse queries one escalation ring further.
        val perCell = math.max(2.5, k / 4.0)
        val l = math.round(
          math.log(n.toDouble / (6.0 * perCell)) / math.log(4.0)).toInt
        math.max(2, math.min(CellIndex.MaxLevel, l))
      }
    // escalation schedule: widen at the base level, then coarsen the
    // level (data cells derived by exact parent arithmetic — no
    // re-encode), ending in the CHEAPEST wrap block (level 2, 96
    // cells; coverage = pi). Wrap-sized intermediate steps are
    // filtered out — they'd explode 4^lvl cells per straggler for the
    // same guarantee the level-2 terminal gives. Stragglers shrink
    // each round, so the later joins broadcast the tiny probe side
    // and scan data once instead of shuffling it.
    val steps: Seq[(Int, Int)] =
      ((Seq((lvl, 1), (lvl, 3)) ++
        Iterator.iterate(lvl - 2)(_ - 2).takeWhile(_ > 2).map(l => (l, 3)).toSeq)
        .filter { case (l, r) => CellIndex.coverageLowerBound(l, r) < math.Pi }
        :+ ((2, 2))).distinct
    val dBase = data.withColumn("__cell", cells.cellAt(col(dNvec), lvl))

    var remaining: DataFrame = queries
    var done: List[DataFrame] = Nil
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var stepList: List[(Int, Int)] = steps.toList
    while (remaining != null && stepList.nonEmpty) {
      val (l, r) = stepList.head
      stepList = stepList.tail
      val dCells =
        if (l == lvl) dBase
        else dBase.withColumn("__cell", cells.parentCell(col("__cell"), lvl - l))
      val probes = remaining
        .withColumn("__cov", cells.ringCoverage(col(qNvec), l, r))
        .withColumn("__cell", explode(cells.ringCells(cells.cellAt(col(qNvec), l), r)))
      if (CellIndex.coverageLowerBound(l, r) == math.Pi) {
        // wrap block: every cell probed, nothing can hide anywhere
        val cand = rank(probes.join(dCells, "__cell").drop("__cell"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        persisted += cand
        done ::= cand.drop("__cov")
        remaining = null
      } else {
        val cand = rankWithStats(probes.join(dCells, "__cell").drop("__cell"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        persisted += cand
        val ok = col("__cnt") >= k &&
          col("__kth") <= col("__cov") * sphereRadius * covDeflate
        done ::= cand.filter(ok).drop("__cov", "__cnt", "__kth")
        val next = remaining
          .join(cand.filter(ok).select(qId), Seq(qId), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        persisted += next
        if (sys.env.contains("GRAFT_KNN_DEBUG"))
          System.err.println(s"KNN_DEBUG step=($l,$r) stragglers=${next.count()}")
        remaining = if (next.isEmpty) null else {
          // stragglers shrink geometrically; once few enough that one
          // wrap-block pass (every data cell probed — still a cell
          // equi-join, the data side is never cross-joined or
          // re-shuffled) stays under the pair budget, jump straight to
          // the terminal instead of paying the remaining ladder steps'
          // fixed per-step stage cost. count() here is free — isEmpty
          // above already materialized the persisted frame.
          if (pairBudgetOk(next.count(), dataCount, bruteForceThreshold))
            stepList = stepList.filter { case (sl, sr) =>
              CellIndex.coverageLowerBound(sl, sr) == math.Pi }
          next
        }
      }
    }
    val result = done.reduce(_ unionByName _).persist(StorageLevel.MEMORY_AND_DISK)
    result.count() // materialize before releasing the intermediates
    persisted.foreach(_.unpersist(blocking = false))
    result
  }

  /** Exact k-nearest-landmarks for every row, against a SMALL
    * in-memory landmark set ((id, nvec) pairs — reference points,
    * beacons, POI anchors): one scalar kernel scan per row
    * ([[graft.functions.GeoKernels.knnLandmarks]]), landmarks riding
    * as plan literals. Stateless and shuffle-free — the plan is a
    * single projection, so it runs unchanged over batch frames AND
    * `readStream` micro-batches in append mode, which makes it the
    * STREAMING kNN path (the iterative-escalation [[knnJoin]] needs
    * driver-side materialization and rank windows, neither of which a
    * stream supports). Use for |landmarks| up to a few thousand;
    * beyond that, index the landmark side and use [[knnJoin]].
    *
    * Output: input columns + (`rank` 1..k, `lm_id`, distCol), ordered
    * by (distance, lm_id) per row — identical semantics to
    * [[knnJoin]] with the same spherical metric and tie-break.
    */
  def knnLandmarks(points: DataFrame, nvecCol: String,
                   landmarks: Seq[(Long, Vec3)], k: Int,
                   sphereRadius: Double = MeanEarthRadius,
                   distCol: String = "dist_m"): DataFrame = {
    require(landmarks.nonEmpty, "landmarks must be non-empty")
    require(k >= 1, s"k must be >= 1 (got $k)")
    import org.apache.spark.sql.types._
    val ids = typedlit(landmarks.map(_._1))
    val flat = typedlit(landmarks.flatMap { case (_, v) => Seq(v.x, v.y, v.z) })
    val outType = ArrayType(StructType(Seq(
      StructField("lm_id", LongType, nullable = false),
      StructField(distCol, DoubleType, nullable = false))), containsNull = false)
    val topk = org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.functions.GeoKernels"), outType, "knnLandmarks",
      Seq(col(nvecCol).getField("x"), col(nvecCol).getField("y"),
        col(nvecCol).getField("z"), ids, flat, lit(k), lit(sphereRadius)),
      Seq(DoubleType, DoubleType, DoubleType,
        ArrayType(LongType, containsNull = false),
        ArrayType(DoubleType, containsNull = false), IntegerType, DoubleType))
    points.select(col("*"), posexplode(topk).as(Seq("__pos", "__knn")))
      .withColumn("rank", col("__pos") + 1)
      .withColumn("lm_id", col("__knn").getField("lm_id"))
      .withColumn(distCol, col("__knn").getField(distCol))
      .drop("__pos", "__knn")
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
    aois.foreach(_.validated) // hemisphere contract of the winding test
    // exact disc covers: enumerate cells at a level sized so each
    // AOI's cover is ~100 cells and keep those whose safe
    // lower-bound distance to the centroid is inside the circumdisc.
    // Unlike a centroid-ring block, this never degenerates to a
    // whole-sphere cover for continent-sized AOIs, so points
    // prefilter to the AOIs that can actually contain them. One
    // shared level so the join key is a single cell column.
    val level = aois.map { a =>
      val discArea = 2.0 * math.Pi *
        (1.0 - math.cos(math.min(math.Pi, math.max(a.circumAngle, 1e-6))))
      // 6*4^L cells on the sphere; want ~96 cells over discArea
      // (capCells descends the quadtree, so fine levels cost only
      // O(cover size * level) — no full-sphere enumeration, no cap
      // coarser than the AOI deserves)
      val l = (0.5 * (math.log(96.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(CellIndex.MaxLevel, l))
    }.min
    val cover: Seq[(Long, String)] = aois.flatMap { a =>
      CellIndex.capCells(a.centroid.x, a.centroid.y, a.centroid.z,
        level, a.circumAngle).map(c => (c, a.id))
    }
    val coverDf = broadcast(cover.toDF("__cell", "aoi_id"))
    val vertsDf = broadcast(aois.map(a => (a.id, a.flatVerts)).toDF("aoi_id", "__verts"))
    points.withColumn("__cell", cells.cellAt(col(pointNvec), level))
      .join(coverDf, "__cell")
      .join(vertsDf, "aoi_id")
      .filter(cells.pointInPolygon(col(pointNvec), col("__verts")))
      .drop("__cell", "__verts")
  }

  /** Buffered AOI join: points within `bufferMeters` of each AOI —
    * the polygon DILATED by the buffer (a point inside counts at any
    * buffer >= 0). Output: point columns + `aoi_id` + signed
    * `distCol` (negative inside, as [[aoiBoundaryDistance]]).
    *
    * Scale shape: identical to [[aoiJoin]] — a broadcast cover map
    * prefilters points by cell — except the quadtree cap covers are
    * grown by the buffer angle (caps with angular radius < pi/2 are
    * geodesically convex, so the polygon's edges stay inside its
    * vertex cap and every buffered point lies within circumAngle +
    * buffer/R of the centroid — the cover is provably complete);
    * the exact predicate is one boundary-distance kernel call per
    * surviving candidate.
    */
  def aoiBufferJoin(points: DataFrame, pointNvec: String, aois: Seq[Aoi],
                    bufferMeters: Double,
                    radius: Double = MeanEarthRadius,
                    distCol: String = "dist_m"): DataFrame = {
    require(aois.nonEmpty)
    require(bufferMeters >= 0.0, s"buffer must be >= 0 (got $bufferMeters)")
    aois.foreach(_.validated)
    val bufAngle = bufferMeters / radius
    val level = aois.map { a =>
      val ang = math.min(math.Pi, math.max(a.circumAngle + bufAngle, 1e-6))
      val discArea = 2.0 * math.Pi * (1.0 - math.cos(ang))
      val l = (0.5 * (math.log(96.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(CellIndex.MaxLevel, l))
    }.min
    val cover: Seq[(Long, String)] = aois.flatMap { a =>
      CellIndex.capCells(a.centroid.x, a.centroid.y, a.centroid.z,
        level, math.min(math.Pi, a.circumAngle + bufAngle)).map(c => (c, a.id))
    }
    val spark = points.sparkSession
    import spark.implicits._
    val coverDf = broadcast(cover.toDF("__cell", "aoi_id"))
    val vertsDf = broadcast(aois.map(a => (a.id, a.flatVerts)).toDF("aoi_id", "__verts"))
    points.withColumn("__cell", cells.cellAt(col(pointNvec), level))
      .join(coverDf, "__cell")
      .join(vertsDf, "aoi_id")
      .withColumn(distCol,
        cells.boundaryDistSigned(col(pointNvec), col("__verts")) * lit(radius))
      .filter(col(distCol) <= bufferMeters)
      .drop("__cell", "__verts")
  }

  /** Shared cover machinery of the multipolygon joins: points keyed
    * by cell at a level sized so each AOI's circumdisc cover is ~100
    * cells, equi-joined against the broadcast (cell, aoi) cover, then
    * against the broadcast ring encodings. Same scale shape as
    * [[aoiJoin]]: the only shuffle is the points' cell hash.
    */
  private def aoiMCover(points: DataFrame, pointNvec: String,
                        aois: Seq[AoiM], extraAngle: Double): DataFrame = {
    require(aois.nonEmpty)
    aois.foreach(_.validated)
    val level = aois.flatMap(_.ringCircumAngles).map { ca =>
      val ang = math.min(math.Pi, math.max(ca + extraAngle, 1e-6))
      val discArea = 2.0 * math.Pi * (1.0 - math.cos(ang))
      val l = (0.5 * (math.log(96.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(CellIndex.MaxLevel, l))
    }.min
    // per-RING circumdisc covers, unioned per AOI: a contained point
    // lies inside some ring's hull, a buffered point within extra of
    // some ring's boundary — either way inside that ring's disc
    val cover: Seq[(Long, String)] = aois.flatMap { a =>
      a.ringsN.indices.flatMap { i =>
        val c = a.ringCentroids(i)
        CellIndex.capCells(c.x, c.y, c.z, level,
          math.min(math.Pi, a.ringCircumAngles(i) + extraAngle)).map(cc => (cc, a.id))
      }.distinct
    }
    val spark = points.sparkSession
    import spark.implicits._
    val coverDf = broadcast(cover.toDF("__cell", "aoi_id"))
    val ringsDf = broadcast(aois.map(a => (a.id, a.flatRings.toSeq))
      .toDF("aoi_id", "__rings"))
    points.withColumn("__cell", cells.cellAt(col(pointNvec), level))
      .join(coverDf, "__cell")
      .join(ringsDf, "aoi_id")
  }

  /** [[aoiJoin]] for multipolygons / polygons with holes: one output
    * row per (point, AOI) whose EVEN-ODD ring containment holds.
    */
  def aoiJoinM(points: DataFrame, pointNvec: String, aois: Seq[AoiM]): DataFrame =
    aoiMCover(points, pointNvec, aois, extraAngle = 0.0)
      .filter(cells.pointInPolygonRings(col(pointNvec), col("__rings")))
      .drop("__cell", "__rings")

  /** [[aoiBufferJoin]] for multipolygons: points within `bufferMeters`
    * of the AOI (negative signed distance = inside; a hole's rim is
    * boundary, so a point deep inside a hole is NOT within a small
    * buffer).
    */
  def aoiBufferJoinM(points: DataFrame, pointNvec: String, aois: Seq[AoiM],
                     bufferMeters: Double,
                     radius: Double = MeanEarthRadius,
                     distCol: String = "dist_m"): DataFrame = {
    require(bufferMeters >= 0.0, s"buffer must be >= 0 (got $bufferMeters)")
    aoiMCover(points, pointNvec, aois, extraAngle = bufferMeters / radius)
      .withColumn(distCol,
        cells.boundaryDistSignedRings(col(pointNvec), col("__rings")) * lit(radius))
      .filter(col(distCol) <= bufferMeters)
      .drop("__cell", "__rings")
  }

  /** [[aoiBoundaryDistance]] for multipolygons: signed distance to
    * the nearest boundary edge of ANY ring (hole rims included),
    * negative when even-odd containment holds. Map-only, one JITed
    * kernel call per (point, AOI).
    */
  def aoiBoundaryDistanceM(points: DataFrame, pointNvec: String,
                           aois: Seq[AoiM],
                           radius: Double = MeanEarthRadius,
                           distCol: String = "dist_m"): DataFrame = {
    require(aois.nonEmpty)
    aois.foreach(_.validated)
    aois.map { a =>
      points.withColumn("aoi_id", lit(a.id))
        .withColumn(distCol,
          cells.boundaryDistSignedRings(col(pointNvec),
            typedLit(a.flatRings.toSeq)) * lit(radius))
    }.reduce(_ unionByName _)
  }

  /** An open polyline for snapping: (latDeg, lonDeg) vertices in
    * order. The map-matching primitive's "road".
    */
  case class Route(id: String, verts: Seq[(Double, Double)]) {
    require(verts.length >= 2, s"route '$id' needs >= 2 vertices")
    def flatVerts: Seq[Double] = verts.flatMap { case (la, lo) =>
      val n = graft.geo.Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
      Seq(n.x, n.y, n.z)
    }
  }

  /** Snap every point to the nearest segment over a literal set of
    * routes (map-matching-lite): output = point columns + `route_id`
    * + `seg` (0-based segment ordinal) + `dist_m` + `snap_n` (the
    * clamped closest point on that segment). Ties break to the
    * smaller (route id, segment ordinal).
    *
    * Scale shape: MAP-ONLY — one JITed [[cells.snapToPolyline]]
    * kernel call per (point, route) inside a single projection, with
    * the winner chosen by `least` over (dist, route) structs; no
    * shuffle, no window, no join. Routes are plan literals like the
    * AOI joins — for route sets too large to inline, cell-index the
    * route segments and equi-join instead.
    */
  def snapToRoutes(points: DataFrame, pointNvec: String,
                   routes: Seq[Route],
                   radius: Double = MeanEarthRadius): DataFrame = {
    require(routes.nonEmpty)
    require(routes.map(_.id).distinct.length == routes.length,
      "route ids must be unique")
    val cands = routes.sortBy(_.id).map { r =>
      val s = cells.snapToPolyline(col(pointNvec),
        array(r.flatVerts.map(lit): _*))
      struct(s.getField("dist").as("dist"), lit(r.id).as("route_id"),
        s.getField("seg").as("seg"), s.getField("fx").as("fx"),
        s.getField("fy").as("fy"), s.getField("fz").as("fz"))
    }
    val withBest = points.withColumn("__best",
      if (cands.length == 1) cands.head else least(cands: _*))
    withBest.select(points.columns.map(col) ++ Seq(
      col("__best.route_id").as("route_id"),
      col("__best.seg").as("seg"),
      (col("__best.dist") * lit(radius)).as("dist_m"),
      geo.vec(col("__best.fx"), col("__best.fy"), col("__best.fz"))
        .as("snap_n")): _*)
  }

  /** Geodesic CORRIDOR join — points within `bufferMeters` of any
    * route polyline, with routes as a TABLE (the lift of
    * [[snapToRoutes]]' literal route set to arbitrarily many routes):
    * one output row per (point, route) in reach, carrying the exact
    * min distance over the route's segments.
    *
    * Scale shape: each route subdivides into corridor PIECES of arc
    * <= 2 * pieceFactor * bufferAngle (a distributed kernel explode —
    * no driver materialization), each piece emits its disc cover
    * cells at a level sized so a piece's cover is a few dozen cells,
    * and points equi-join the cover on their own cell id. The exact
    * predicate then runs against the ORIGINAL segment endpoints the
    * piece carries (identical arithmetic to a per-segment SQL
    * mirror — subdivision steers only candidate generation), and a
    * final (point, route) min-aggregation collapses piece
    * multiplicity map-side. Never all points x all segments; a
    * point's candidates are the pieces whose corridor disc holds its
    * cell.
    *
    * Cover proof: every point within buffer of a piece lies within
    * d(p, q in piece) + d(q, mid) <= bufferAngle + pieceArc/2 of the
    * piece's slerp midpoint, and the cover disc uses exactly that
    * radius bound.
    *
    * @param routes table of (routeIdCol, vertsCol) with vertsCol a
    *   flat [x0,y0,z0,x1,...] n-vector array (>= 2 vertices; build
    *   literals with [[graft.index.cells.polygonLiteral]]).
    * @param pieceFactor piece arc bound as a multiple of the buffer
    *   angle — larger = fewer pieces but looser covers.
    */
  def corridorJoin(points: DataFrame, pointNvec: String, pointId: String,
                   routes: DataFrame, routeIdCol: String, vertsCol: String,
                   bufferMeters: Double,
                   radius: Double = MeanEarthRadius,
                   pieceFactor: Double = 4.0,
                   distCol: String = "dist_m"): DataFrame = {
    require(bufferMeters > 0.0, s"buffer must be > 0 (got $bufferMeters)")
    require(pieceFactor > 0.0, s"pieceFactor must be > 0 (got $pieceFactor)")
    val bufAngle = bufferMeters / radius
    val maxPiece = 2.0 * pieceFactor * bufAngle
    val coverAngle = math.min(math.Pi, maxPiece / 2.0 + bufAngle)
    // same sizing rule as the AOI covers: ~96 cells per piece disc
    val level = {
      val discArea = 2.0 * math.Pi * (1.0 - math.cos(math.max(coverAngle, 1e-6)))
      val l = (0.5 * (math.log(96.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(CellIndex.MaxLevel, l))
    }
    def pc(i: Int) = element_at(col("__p"), i)
    // endpoints ride as FLAT doubles and the exact predicate is ONE
    // JITed kernel call (cells.segDist): the composed Column form
    // (geo.segmentDistanceRad) duplicates its normal/foot subtrees
    // per reference, and over element_at-computed endpoints the
    // collapsed projection's thousands of extract-value nodes wedge
    // Catalyst's NestedColumnAliasing for tens of minutes
    val pieces = routes
      .select(col(routeIdCol), explode(cells.corridorPieces(col(vertsCol), maxPiece)).as("__p"))
      .select(col(routeIdCol),
        pc(2).as("__ax"), pc(3).as("__ay"), pc(4).as("__az"),
        pc(5).as("__bx"), pc(6).as("__by"), pc(7).as("__bz"),
        geo.vec(pc(8), pc(9), pc(10)).as("__sm"))
    val covers = pieces.withColumn("__cell",
      explode(cells.capCells(col("__sm"), level, coverAngle)))
      .drop("__sm")
    points.select(col(pointId), col(pointNvec))
      .withColumn("__cell", cells.cellAt(col(pointNvec), level))
      .join(covers, "__cell")
      .withColumn(distCol,
        cells.segDist(col(pointNvec),
          geo.vec(col("__ax"), col("__ay"), col("__az")),
          geo.vec(col("__bx"), col("__by"), col("__bz"))) * lit(radius))
      .filter(col(distCol) <= bufferMeters)
      .groupBy(col(pointId), col(routeIdCol))
      .agg(min(col(distCol)).as(distCol))
  }

  /** Route-route INTERSECTION join between two polyline TABLES: one
    * row per (aId, bId) pair whose geodesic polylines share a point —
    * some minor-arc segment of one crossing or touching a segment of
    * the other ([[cells.segsCross]], the exact crossing predicate of
    * ringsIntersect per segment pair).
    *
    * Scale shape: each side splits into corridor pieces of at most
    * `pieceMeters` arc (cells.corridorPieces) and candidates come
    * from an ASYMMETRIC cap-vs-cell equi-join (the corridorJoin
    * pattern, made exactly-once): a crossing point lies on a piece
    * of each side, hence within maxPiece/2 of BOTH piece midpoints,
    * so the two midpoints sit within maxPiece of each other — the A
    * side covers each piece midpoint's cap of radius maxPiece (~96
    * cells at the level the sizing rule picks for that disc), the B
    * side emits ONE row per piece: its midpoint's own cell at the
    * same level. The B cell's safe lower-bound distance to the A
    * midpoint is <= the midpoint distance <= maxPiece, so it is in
    * the A cap cover — candidates are complete; and since a cap
    * cover's cells are distinct while B contributes a single cell,
    * each (A piece, B piece) pair joins AT MOST ONCE — no cell-grain
    * duplicate hits at all (the symmetric two-sided cover this
    * replaces multiplied every pair by its shared-cell count), and
    * the B-side fan-out is one slim row per piece instead of ~96.
    * The fan-out rows are SLIM — (id, segment index, cell) only;
    * segment endpoints rejoin per candidate — so the cover
    * sort/shuffle volume is the cell count, not cells x endpoint
    * payload. The exact predicate runs on the ORIGINAL segment
    * endpoints (pieces only add the cover midpoint), so piece
    * granularity moves cost, never correctness; piece multiplicity
    * collapses at the (aId, aSeg, bId, bSeg) grain before the kernel
    * runs, the final distinct at (aId, bId) — both bounded by
    * candidate pairs, not the id cross product. No driver-side
    * values at all — the level is computed from the constant piece
    * angle, so either side empty just yields the typed empty result
    * through the ordinary join.
    *
    * `orderedPairs = true` (for SELF joins where only a < b pairs are
    * wanted) applies `aIdCol < bIdCol` at the candidate grain —
    * before the dedups and the kernel — halving the downstream work;
    * the result is exactly the symmetric result filtered to a < b.
    *
    * Contract: a fully DEGENERATE polyline (every vertex coincident)
    * spans no arc and never matches — its point piece fails the
    * crossing predicate by the degenerate-edge rule; route tables
    * with point rows should pre-filter or route them through
    * [[corridorJoin]] with a radius instead. Segments whose endpoints
    * are (near-)ANTIPODAL (within ~1e-12 of pi apart) are likewise a
    * caller bug, the same domain as segDistRad: no unique great
    * circle exists, corridorPieces' linear-blend/perpendicular
    * midpoint fallback can sit far from the piece, and the
    * maxPiece/2 cover-completeness proof does not hold for them —
    * pre-split such segments before joining. Column names of the two
    * sides must be disjoint.
    */
  def routeIntersectJoin(aRoutes: DataFrame, aIdCol: String, aVertsCol: String,
                         bRoutes: DataFrame, bIdCol: String, bVertsCol: String,
                         pieceMeters: Double = 250e3,
                         radius: Double = MeanEarthRadius,
                         orderedPairs: Boolean = false): DataFrame = {
    require(pieceMeters > 0.0, s"pieceMeters must be > 0 (got $pieceMeters)")
    val maxPiece = math.min(math.Pi, pieceMeters / radius)
    // 1e-9 relative slack absorbs the slerp midpoints' rounding (both
    // sides') so two pieces crossing with midpoints at exactly
    // maxPiece apart still key the same cell/cap
    val coverAngle = math.min(math.Pi, maxPiece * (1.0 + 1e-9))
    // corridorJoin's sizing formula but targeting ~8 cells per A-side
    // cap disc, NOT ~96: the 96 rule suits point-probe joins, where
    // the probe side is huge (one cell per point) and every false
    // candidate pays a kernel call on a wide payload row — fine cells
    // are worth their cover volume there. Here BOTH sides are piece
    // grain, false candidates are slim 4-column id rows collapsed
    // before the kernel, and the cover explode dominates the cost:
    // measured on the 3k-route sf0.1 gate, level 7 (the 96 rule) =
    // 7.2M cover rows / 1.36M candidates, level 5 (this rule) = 0.64M
    // cover rows / 1.98M candidates — the coarser cover more than
    // halves the join's total row volume. Both levels are exact; the
    // level moves only cost (candidate slop scales with the same
    // piece density as the true pairs, so the ratio holds at scale).
    val level = {
      val discArea = 2.0 * math.Pi * (1.0 - math.cos(math.max(coverAngle, 1e-6)))
      val l = (0.5 * (math.log(8.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(CellIndex.MaxLevel, l))
    }
    def pc(i: Int) = element_at(col("__p"), i)
    // the cell fan-out carries ONLY (id, segment index, cell) — the
    // six endpoint doubles would triple the sorted/shuffled cover
    // volume (an 800k-route probe OOMed the cover sort at the default
    // 8g with endpoints riding the explode); candidates collapse at
    // the slim (aId, aSeg, bId, bSeg) grain so the crossing kernel
    // runs once per segment pair, then endpoints rejoin by (id, seg).
    // The predicate stays ONE JITed kernel call over flat doubles —
    // the corridorJoin NestedColumnAliasing note applies verbatim.
    //
    // Endpoints come from a ONE-piece-per-segment corridorPieces pass
    // (maxPieceRad = pi): same per-segment emission rule and the same
    // degenerate-polyline fallback as the subdividing pass, so the
    // joined (id, seg) keys and endpoint doubles are identical — and
    // being one row per segment, it needs no dropDuplicates and does
    // not re-run the subdividing explode (the old plan executed it
    // twice per side).
    def segsOf(df: DataFrame, idCol: String, vertsCol: String, tag: String) =
      df.select(col(idCol),
        explode(cells.corridorPieces(col(vertsCol), math.Pi)).as("__p"))
        .select(col(idCol),
          pc(1).cast("int").as(s"__${tag}seg"),
          pc(2).as(s"__${tag}ax"), pc(3).as(s"__${tag}ay"), pc(4).as(s"__${tag}az"),
          pc(5).as(s"__${tag}bx"), pc(6).as(s"__${tag}by"), pc(7).as(s"__${tag}bz"))
    val coverA = aRoutes.select(col(aIdCol),
        explode(cells.corridorPieces(col(aVertsCol), maxPiece)).as("__p"))
      .select(col(aIdCol), pc(1).cast("int").as("__aseg"),
        explode(cells.capCells(geo.vec(pc(8), pc(9), pc(10)), level, coverAngle))
          .as("__cell"))
    val keyB = bRoutes.select(col(bIdCol),
        explode(cells.corridorPieces(col(bVertsCol), maxPiece)).as("__p"))
      .select(col(bIdCol), pc(1).cast("int").as("__bseg"),
        cells.cellAt(geo.vec(pc(8), pc(9), pc(10)), level).as("__cell"))
    val cand0 = coverA.join(keyB, "__cell")
    val cand = if (orderedPairs) cand0.filter(col(aIdCol) < col(bIdCol)) else cand0
    cand
      .select(col(aIdCol), col("__aseg"), col(bIdCol), col("__bseg"))
      .dropDuplicates(aIdCol, "__aseg", bIdCol, "__bseg")
      .join(segsOf(aRoutes, aIdCol, aVertsCol, "a"), Seq(aIdCol, "__aseg"))
      .join(segsOf(bRoutes, bIdCol, bVertsCol, "b"), Seq(bIdCol, "__bseg"))
      .filter(cells.segsCross(
        geo.vec(col("__aax"), col("__aay"), col("__aaz")),
        geo.vec(col("__abx"), col("__aby"), col("__abz")),
        geo.vec(col("__bax"), col("__bay"), col("__baz")),
        geo.vec(col("__bbx"), col("__bby"), col("__bbz"))))
      .select(col(aIdCol), col(bIdCol))
      .dropDuplicates(aIdCol, bIdCol)
  }

  /** Shared candidate machinery of the polygon-TABLE joins: each
    * polygon row emits its mixed-level ring-circumdisc cover
    * ([[cells.ringCoverCells]] — every ring at its OWN ~96-cell
    * level, so a continent and a city block in the same table each
    * get a proportionate cover), points emit one cell id per
    * DISTINCT cover level (levels ride inside the cell id, so mixed
    * levels still equi-join on the single cell key), the cover is
    * [[ancestorFreeCover]] so each (point, polygon) candidate arises
    * exactly once — no dedup shuffle — and the ring encodings join
    * back by polygon id (AQE broadcasts small polygon tables).
    *
    * The distinct level list is the only driver-side value: <= 25
    * ints off the cheap levels-only kernel pass. Cover proof: rings
    * pass the hemisphere contract (kernel-enforced, throwing — table
    * rows have no construction-time `validated` hook), so each
    * ring's interior stays inside its circumdisc (geodesic balls of
    * radius < pi/2 are convex); an even-odd-contained point is
    * inside some ring's hull, a buffered point within extra of some
    * ring's boundary — either way inside that ring's grown disc.
    * Rows with null rings / null point positions drop out (no cover
    * cells / no cell key). Column names of `points` and `polys`
    * must be disjoint.
    */
  /** Distinct, per-polygon ANCESTOR-FREE cover (no cover cell
    * contains another of the same polygon): a cell whose proper
    * ancestor at a coarser cover level is also in the cover is
    * dropped. Completeness holds — a point keying the dropped cell
    * keys the surviving ancestor at that ancestor's own level — and
    * a point's per-level cells can then hit at most ONE cover cell
    * per polygon (one cell per level, and a cross-level double hit
    * would force the finer cover cell inside the coarser one, which
    * ancestor-freeness excludes). This makes the candidate equi-join
    * exactly-once per (point, polygon) BY CONSTRUCTION: no
    * candidates-sized dedup shuffle in batch, no keyed dedup state
    * in streaming — the pruning self-join is cells-only (~96 cells
    * per ring), orders of magnitude below the candidate volume it
    * replaces.
    */
  private[graft] def ancestorFreeCover(polysN: DataFrame, polyIdCol: String,
                                       ringsCol: String, extraRad: Double,
                                       levels: Array[Int]): DataFrame = {
    // SINGLE-RING polygons (the common case — parcels, blocks, admin
    // areas without holes) already have a distinct, single-level,
    // trivially ancestor-free cover: keep them as a pure map-side
    // explode with NO shuffle, exactly the pre-pruning plan. Only
    // multi-ring rows (holes/multipolygons, whose rings can overlap
    // within a level and nest across levels) pay the distinct +
    // pruning machinery — measured: pruning everything cost a flat
    // ~7.5 s on a 20k-polygon table of single-ring quads.
    val ringCount = col(ringsCol).getItem(0)
    val simple = polysN
      .filter(col(ringsCol).isNotNull && ringCount === 1.0)
      .select(col(polyIdCol),
        explode(cells.ringCoverCells(col(ringsCol), extraRad)).as("__cell"))
    val cover0 = polysN
      .filter(col(ringsCol).isNotNull && ringCount =!= 1.0)
      .select(col(polyIdCol),
        explode(cells.ringCoverCells(col(ringsCol), extraRad)).as("__cell"))
      .distinct()
    val pruned =
      if (levels.length <= 1) cover0 // one global level: nothing nests
      else {
        val contained = cover0
          .withColumn("__anc", explode(array(levels.toSeq.map(l =>
            when(cells.cellLevel(col("__cell")) > l,
              cells.ancestorAt(col("__cell"), l))): _*)))
          .filter(col("__anc").isNotNull)
          .join(cover0.select(col(polyIdCol), col("__cell").as("__anc")),
            Seq(polyIdCol, "__anc"), "left_semi")
          .select(col(polyIdCol), col("__cell"))
        cover0.join(contained, Seq(polyIdCol, "__cell"), "left_anti")
      }
    simple.unionByName(pruned)
  }

  private def polygonCandidates(points: DataFrame, pointNvec: String,
                                pointId: String, polys: DataFrame,
                                polyIdCol: String, ringsCol: String,
                                extraRad: Double): DataFrame = {
    val polysN = polys.select(col(polyIdCol), col(ringsCol))
    val levels = polysN
      .select(explode(cells.ringCoverLevels(col(ringsCol), extraRad)).as("__l"))
      .distinct().collect().map(_.getInt(0)).sorted
    val cover = ancestorFreeCover(polysN, polyIdCol, ringsCol, extraRad, levels)
    // An empty polygon table (or all-null rings) is a legitimate
    // filtered state, not a contract violation: a null cell key never
    // equi-joins, so the same chain yields the correctly-typed empty
    // result instead of throwing mid-pipeline.
    val pointCell: Column =
      if (levels.isEmpty) lit(null).cast("long")
      else explode(array(levels.map(l => cells.cellAt(col(pointNvec), l)): _*))
    points
      .withColumn("__cell", pointCell)
      .join(cover, "__cell") // exactly-once per (point, polygon): see ancestorFreeCover
      .join(polysN, polyIdCol)
      .drop("__cell")
  }

  /** Point-in-polygon join with polygons as a TABLE — the lift of
    * [[aoiJoinM]]'s literal AOI list to arbitrarily many polygons
    * (admin boundaries, land masks), same even-odd ring semantics.
    * One output row per (point, polygon) whose containment holds:
    * all point columns + `polyIdCol`.
    *
    * Scale shape: one points scan fanning out one NARROW row per
    * distinct cover level (pass a narrow frame and join payloads
    * back by `pointId`), a cell equi-join against the distributed
    * cover (never |points| x |polys|), ring data joined back by
    * polygon id only for candidates, and ONE
    * [[cells.pointInPolygonRings]] kernel call per candidate.
    *
    * @param pointId a UNIQUE point key — the (point, polygon)
    *   candidate dedup keys on it, so duplicate ids would collapse
    *   distinct points (same contract as [[corridorJoin]]).
    * @param polys table of (polyIdCol, ringsCol) with ringsCol the
    *   ring-list encoding [k, n_0..n_{k-1}, ring coords...] (build
    *   literals with [[graft.index.cells.ringsLiteral]] or
    *   AoiM.flatRings).
    */
  def polygonJoin(points: DataFrame, pointNvec: String, pointId: String,
                  polys: DataFrame, polyIdCol: String,
                  ringsCol: String): DataFrame =
    polygonCandidates(points, pointNvec, pointId, polys, polyIdCol,
      ringsCol, extraRad = 0.0)
      .filter(cells.pointInPolygonRings(col(pointNvec), col(ringsCol)))
      .drop(ringsCol)

  /** Buffered polygon-TABLE join: points within `bufferMeters` of
    * each polygon (signed distance — negative inside by even-odd, a
    * hole's rim is boundary), the lift of [[aoiBufferJoinM]] to
    * polygon tables. Output: point columns + polyIdCol + `distCol`.
    */
  def polygonBufferJoin(points: DataFrame, pointNvec: String, pointId: String,
                        polys: DataFrame, polyIdCol: String, ringsCol: String,
                        bufferMeters: Double,
                        radius: Double = MeanEarthRadius,
                        distCol: String = "dist_m"): DataFrame = {
    require(bufferMeters >= 0.0, s"buffer must be >= 0 (got $bufferMeters)")
    polygonCandidates(points, pointNvec, pointId, polys, polyIdCol,
      ringsCol, extraRad = bufferMeters / radius)
      .withColumn(distCol,
        cells.boundaryDistSignedRings(col(pointNvec), col(ringsCol)) * lit(radius))
      .filter(col(distCol) <= bufferMeters)
      .drop(ringsCol)
  }

  /** Zonal statistics: per-polygon aggregates over the exact PIP
    * join (polygon population counts, per-admin-area sums/means —
    * the standard summarize-points-by-zone operation). One output
    * row per polygon containing at least one point: `polyIdCol` +
    * the given aggregate columns (alias each with `.as(...)`).
    *
    * Scale shape: [[polygonJoin]]'s candidate machinery (mixed-level
    * per-ring covers, one even-odd kernel call per candidate)
    * feeding a declarative groupBy — the aggregation is PARTIAL
    * (map-side combine), so the post-join shuffle carries one row
    * per (task, polygon), never the joined rows, and the output is
    * at most |polygons| rows. Pass a NARROW points frame (id + nvec
    * + the aggregated value columns): every point column rides
    * through the join to the aggregation.
    */
  def zonalStats(points: DataFrame, pointNvec: String, pointId: String,
                 polys: DataFrame, polyIdCol: String, ringsCol: String,
                 aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "zonalStats needs at least one aggregate column")
    polygonJoin(points, pointNvec, pointId, polys, polyIdCol, ringsCol)
      .groupBy(col(polyIdCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Nearest-polygon join: for every point, the polygon minimizing
    * the DISTANCE TO THE REGION (0 for contained points, great-circle
    * distance to the nearest ring edge outside; ties by smallest
    * polygon id), plus that distance in meters — nearest admin area /
    * closest-AOI assignment. Output: (pointId, polyIdCol, distCol),
    * one row per point whose nearest polygon lies within `maxMeters`
    * (the default cap pi*R matches every point against a non-empty
    * table). The frame is materialized and persisted; unpersist it
    * when done, as with [[Clustering.dbscan]].
    *
    * Scale shape: an escalation ladder of provably-complete
    * [[polygonBufferJoin]]s — round r joins only the still-unmatched
    * points against covers grown by b_r (b, 4b, 16b, ...,
    * maxMeters), so the cover volume paid per point is proportional
    * to how far that point actually is from its nearest polygon,
    * never to the search cap. Every polygon within b_r of a point is
    * a candidate at round r (the buffered join's cover proof), so if
    * a point has ANY candidate its per-point argmin is already the
    * exact global nearest — matched points leave the ladder, starved
    * points escalate. Rounds are log4(max/start), each one exchange
    * + one map-side-combined min; the loop materializes only narrow
    * (id, nvec) frames between rounds.
    */
  def nearestPolygon(points: DataFrame, pointNvec: String, pointId: String,
                     polys: DataFrame, polyIdCol: String, ringsCol: String,
                     startMeters: Double = 100e3,
                     maxMeters: Double = math.Pi * MeanEarthRadius,
                     radius: Double = MeanEarthRadius,
                     distCol: String = "dist_m"): DataFrame = {
    require(startMeters > 0.0, s"startMeters must be > 0 (got $startMeters)")
    require(maxMeters >= startMeters,
      s"maxMeters ($maxMeters) must be >= startMeters ($startMeters)")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val retired = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def keep(df: DataFrame): DataFrame = { retired += df.persist(lvl); df }
    val dbg = sys.env.get("GRAFT_LADDER_DEBUG").contains("1")
    try {
      var starved = keep(points.select(col(pointId), col(pointNvec)))
      // round 1 always runs (it also types the empty-input result)
      var more = true
      val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var b = startMeters
      while (more) {
        val tR0 = System.nanoTime()
        val lastRound = b >= maxMeters
        val cand = polygonBufferJoin(starved, pointNvec, pointId,
          polys, polyIdCol, ringsCol, math.min(b, maxMeters), radius, "__sd")
        val best = keep(cand
          .groupBy(col(pointId))
          .agg(min(struct(greatest(col("__sd"), lit(0.0)).as("d"),
            col(polyIdCol).as("p"))).as("__m"))
          .select(col(pointId), col("__m.p").as(polyIdCol),
            col("__m.d").as(distCol)))
        rounds += best
        if (lastRound) more = false
        else {
          starved = keep(starved.join(best.select(col(pointId)),
            Seq(pointId), "left_anti"))
          more = starved.count() > 0L
          b = b * 4.0
        }
        if (dbg) println(f"[ladder-poly] b=${math.min(b, maxMeters)}%.0f " +
          f"sec=${(System.nanoTime() - tR0) / 1e9}%.1f")
      }
      val out = rounds.reduceLeft(_ unionByName _)
        .persist(lvl)
      out.count()
      out
    } finally retired.foreach(_.unpersist())
  }

  /** Nearest ROUTE per point over a route TABLE (the route analogue
    * of [[nearestPolygon]], and the table-scale lift of
    * [[snapToRoutes]]' global argmin): output (pointId, routeIdCol,
    * distCol) — one row per point whose nearest route polyline lies
    * within `maxMeters`, distance = exact min over the route's
    * segments, ties to the smaller route id. The result is
    * materialized and persisted; unpersist it when done.
    *
    * Scale shape: an escalation ladder of provably-complete
    * [[corridorJoin]]s — round r joins only the still-unmatched
    * points against corridors buffered by b_r (b, 4b, 16b, ...,
    * maxMeters), so the candidate volume paid per point tracks how
    * far that point actually is from its nearest route, never the
    * search cap. Every route within b_r of a point is a candidate at
    * round r (the corridor cover proof), and candidates carry their
    * EXACT segment-min distance, so a point with any candidate
    * already holds its global argmin (non-candidates sit beyond b_r
    * >= every candidate distance); matched points leave the ladder,
    * starved points escalate. Rounds are log4(max/start), each one
    * candidate equi-join + one map-side-combined min; only narrow
    * (id, nvec) frames persist between rounds.
    */
  def nearestRoute(points: DataFrame, pointNvec: String, pointId: String,
                   routes: DataFrame, routeIdCol: String, vertsCol: String,
                   startMeters: Double = 100e3,
                   maxMeters: Double = math.Pi * MeanEarthRadius,
                   radius: Double = MeanEarthRadius,
                   pieceFactor: Double = 4.0,
                   distCol: String = "dist_m"): DataFrame = {
    require(startMeters > 0.0, s"startMeters must be > 0 (got $startMeters)")
    require(maxMeters >= startMeters,
      s"maxMeters ($maxMeters) must be >= startMeters ($startMeters)")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val retired = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def keep(df: DataFrame): DataFrame = { retired += df.persist(lvl); df }
    val dbg = sys.env.get("GRAFT_LADDER_DEBUG").contains("1")
    try {
      var starved = keep(points.select(col(pointId), col(pointNvec)))
      var more = true
      val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var b = startMeters
      while (more) {
        val tR0 = System.nanoTime()
        val lastRound = b >= maxMeters
        val cand = corridorJoin(starved, pointNvec, pointId,
          routes, routeIdCol, vertsCol, math.min(b, maxMeters), radius,
          pieceFactor, "__sd")
        val best = keep(cand
          .groupBy(col(pointId))
          .agg(min(struct(col("__sd").as("d"), col(routeIdCol).as("r"))).as("__m"))
          .select(col(pointId), col("__m.r").as(routeIdCol),
            col("__m.d").as(distCol)))
        rounds += best
        if (lastRound) more = false
        else {
          starved = keep(starved.join(best.select(col(pointId)),
            Seq(pointId), "left_anti"))
          more = starved.count() > 0L
          b = b * 4.0
        }
        if (dbg) println(f"[ladder-route] b=${math.min(b, maxMeters)}%.0f " +
          f"sec=${(System.nanoTime() - tR0) / 1e9}%.1f")
      }
      val out = rounds.reduceLeft(_ unionByName _)
        .persist(lvl)
      out.count()
      out
    } finally retired.foreach(_.unpersist())
  }

  /** Dissolve: label every polygon with its overlay CONNECTED
    * COMPONENT — the transitive closure of pairwise intersection
    * (AOI consolidation, admin-boundary cleanup, merging duplicate
    * footprints before zonal work double-counts them). One output
    * row per input polygon with non-null rings: `polyIdCol` +
    * `componentCol` = the minimum polygon id reachable through
    * chains of intersecting polygons (isolated polygons label
    * themselves). Ids must be unique and orderable.
    *
    * Scale shape: [[polygonIntersectJoin]] self-join builds the edge
    * list (cover re-keying, never |P|^2; the symmetric candidate
    * halves to one edge per unordered pair before components run),
    * then [[Dedup.connectedComponents]] resolves labels — min-label
    * propagation with pointer doubling, log-diameter rounds, with
    * the small-edge-list driver union-find fast path — the same
    * machinery that resolves near-dup clusters, so chains of
    * thousands of overlapping parcels converge without per-pair
    * recursion.
    */
  def polygonDissolve(polys: DataFrame, polyIdCol: String, ringsCol: String,
                      componentCol: String = "component"): DataFrame = {
    val a = polys.select(col(polyIdCol).as("__pa"), col(ringsCol).as("__ra"))
    val b = polys.select(col(polyIdCol).as("__pb"), col(ringsCol).as("__rb"))
    val edges = polygonIntersectJoin(a, "__pa", "__ra", b, "__pb", "__rb",
      orderedPairs = true)
    val comp = Dedup.connectedComponents(edges, "__pa", "__pb")
    polys.filter(col(ringsCol).isNotNull)
      .select(col(polyIdCol))
      .join(comp.select(col("node").as(polyIdCol), col("component")),
        Seq(polyIdCol), "left")
      .select(col(polyIdCol),
        coalesce(col("component"), col(polyIdCol)).as(componentCol))
  }

  /** Polygon-polygon INTERSECTION join between two polygon TABLES:
    * one output row (aIdCol, bIdCol) per pair of even-odd ring-list
    * regions sharing any point (boundaries included) — the overlay
    * primitive (which parcels touch which zones, which AOIs overlap
    * which admin areas).
    *
    * Scale shape: both sides emit their mixed-level per-ring
    * circumdisc covers ([[cells.ringCoverCells]]), and each cover
    * cell RE-KEYS at the target levels where a cross-side match can
    * happen — its own level when the other side covers at that level
    * or finer, plus the other side's strictly-coarser levels — so
    * two cells sharing area always equi-join at exactly the coarser
    * cell's id (levels ride in the id; the driver sees only the two
    * <= 25-int level lists). Candidates dedup per (a, b) pair, ring
    * encodings join back by polygon id only for candidates, and the
    * exact [[cells.ringsIntersect]] kernel (edge-crossing sweep +
    * vertex-containment by parity) runs once per candidate — never
    * |A| x |B|.
    *
    * Ids must be unique per polygon; column names of the two tables
    * must be disjoint; null-rings rows drop out (no cover).
    */
  def polygonIntersectJoin(aPolys: DataFrame, aIdCol: String, aRingsCol: String,
                           bPolys: DataFrame, bIdCol: String,
                           bRingsCol: String,
                           orderedPairs: Boolean = false): DataFrame = {
    def lv(df: DataFrame, rings: String): Array[Int] = df
      .select(explode(cells.ringCoverLevels(col(rings), 0.0)).as("__l"))
      .distinct().collect().map(_.getInt(0)).sorted
    val levelsA = lv(aPolys, aRingsCol)
    val levelsB = lv(bPolys, bRingsCol)
    // Either side empty (or all rings null) → no pairs, by the same
    // empty-input contract as every other join primitive here.
    if (levelsA.isEmpty || levelsB.isEmpty)
      return aPolys.select(col(aIdCol)).limit(0)
        .crossJoin(bPolys.select(col(bIdCol)).limit(0))
    // a pair of cover cells (la, lb) containing a common point match
    // at t = min(la, lb): the finer cell's ancestor IS the coarser
    // cell. Each side therefore re-keys its cell (level l) at the
    // other side's levels strictly below l, plus l itself when the
    // other side has some level >= l. Shared level values can match
    // a pair twice — the candidate dedup absorbs that.
    def keyed(df: DataFrame, idCol: String, rings: String,
              own: Array[Int], other: Array[Int]): DataFrame = {
      val cover = df.select(col(idCol),
        explode(cells.ringCoverCells(col(rings), 0.0)).as("__c"))
      val lvlC = cells.cellLevel(col("__c"))
      val targets: Seq[Column] = own.toSeq.flatMap { l =>
        val ts = other.filter(_ < l).toSeq ++
          (if (other.exists(_ >= l)) Seq(l) else Nil)
        ts.map(t => when(lvlC === l, cells.ancestorAt(col("__c"), t)))
      }
      cover.select(col(idCol), explode(array(targets: _*)).as("__key"))
        .filter(col("__key").isNotNull)
    }
    // orderedPairs (self joins wanting only a < b): the id filter
    // lands at the candidate grain — before the pair dedup, the ring
    // rejoin and the kernel — halving the downstream work; the result
    // is exactly the symmetric result filtered to a < b.
    val cand0 = keyed(aPolys, aIdCol, aRingsCol, levelsA, levelsB)
      .join(keyed(bPolys, bIdCol, bRingsCol, levelsB, levelsA), "__key")
    val cand = if (orderedPairs) cand0.filter(col(aIdCol) < col(bIdCol)) else cand0
    cand
      .dropDuplicates(aIdCol, bIdCol)
      .join(aPolys.select(col(aIdCol), col(aRingsCol)), aIdCol)
      .join(bPolys.select(col(bIdCol), col(bRingsCol)), bIdCol)
      .filter(cells.ringsIntersect(col(aRingsCol), col(bRingsCol)))
      .select(col(aIdCol), col(bIdCol))
  }

  /** Signed great-circle distance from every point to each AOI's
    * BOUNDARY: negative inside the polygon, positive outside (the
    * buffer/erosion primitive — `dist_m <= b` selects the polygon
    * dilated by b, `dist_m <= -b` the polygon eroded by b). One
    * output row per (point, AOI).
    *
    * Scale shape: AOIs are a small literal list by contract (same as
    * [[aoiJoin]]); each point row makes ONE JITed kernel call per AOI
    * (CellKernels.boundaryDistSigned — min over clamped per-edge
    * segment distances + the winding inside test in a single flat
    * pass), so the whole operator is map-only: a union of narrow
    * projections, no join, no shuffle, nothing collected. For
    * thousands of AOIs use [[aoiJoin]]'s broadcast-cover machinery
    * instead.
    */
  def aoiBoundaryDistance(points: DataFrame, pointNvec: String,
                          aois: Seq[Aoi],
                          radius: Double = MeanEarthRadius,
                          distCol: String = "dist_m"): DataFrame = {
    require(aois.nonEmpty)
    aois.foreach(_.validated) // inside-test hemisphere contract
    aois.map { a =>
      points.withColumn("aoi_id", lit(a.id))
        .withColumn(distCol,
          cells.boundaryDistSigned(col(pointNvec),
            typedLit(a.flatVerts.toSeq)) * lit(radius))
    }.reduce(_ unionByName _)
  }

  /** Geofence enter/exit events: for each (track, AOI), one row per
    * containment TRANSITION along the time-ordered track — `enter`
    * when the fence is entered (including a track whose first fix is
    * already inside — the fence session has begun), `exit` when left;
    * a track that ends inside emits no trailing exit (no later fix to
    * anchor it). Null time / null position rows are dropped by
    * contract (same convention as sessionize / the track operators).
    * Duplicate timestamps order DETERMINISTICALLY outside-first (the
    * window breaks time ties on the inside flag; equal-flag ties are
    * interchangeable — no transition between them either way), so a
    * tied in/out pair always reads as ending INSIDE and the output is
    * stable across runs and engines.
    *
    * Scale shape: the inside flag is ONE winding-kernel call per
    * (point, AOI) in a map-only projection over a broadcast literal
    * AOI set (the operator is for named fence sets, not an AOI
    * table — route big polygon TABLES through aoiJoin's cover join);
    * the only shuffle is the window's (track, aoi) hash partition,
    * carrying points x |aois| rows of (track, time, aoi_id, flag) —
    * payload columns do not ride through the fan-out.
    *
    * @return (trackCol, timeCol, aoi_id, event) ordered rows per
    *         window; event in {enter, exit}.
    */
  def geofenceTransitions(points: DataFrame, trackCol: String,
                          timeCol: String, pointNvec: String,
                          aois: Seq[Aoi]): DataFrame = {
    require(aois.nonEmpty)
    aois.foreach(_.validated) // winding-test hemisphere contract
    val spark = points.sparkSession
    import spark.implicits._
    val vertsDf = broadcast(
      aois.map(a => (a.id, a.flatVerts.toSeq)).toDF("aoi_id", "__verts"))
    val w = Window.partitionBy(col(trackCol), col("aoi_id"))
      .orderBy(col(timeCol), col("__in"))
    points
      .filter(col(timeCol).isNotNull && col(pointNvec).isNotNull)
      .select(col(trackCol), col(timeCol), col(pointNvec))
      .crossJoin(vertsDf)
      .withColumn("__in", cells.pointInPolygon(col(pointNvec), col("__verts")))
      .withColumn("__prev", lag(col("__in"), 1).over(w))
      .filter((col("__prev").isNull && col("__in")) ||
        (col("__prev").isNotNull && col("__prev") =!= col("__in")))
      .select(col(trackCol), col(timeCol), col("aoi_id"),
        when(col("__in"), lit("enter")).otherwise(lit("exit")).as("event"))
  }

  /** Dwell time per (track, AOI): the total time spent inside each
    * fence, attributing each inter-fix interval [t_i, t_{i+1}) to
    * the STATE AT ITS START (left-constant interpolation — the same
    * convention sessionize/staypoints use for gaps); the last fix of
    * a track anchors no interval. Every (track, AOI) pair with at
    * least one valid fix gets a row — zero dwell included — plus the
    * inside-fix count so downstream can tell "never entered" from
    * "entered between samples". Null time / null position rows drop
    * by the track-operator contract — note the consequence: the
    * interval preceding a dropped fix merges into the PRIOR valid
    * fix's interval and inherits that fix's inside/outside state, so
    * dwell silently stretches across sensor-gap rows; pre-filter or
    * re-segment tracks if gap rows must not attribute time.
    * `timeCol` must be NUMERIC and
    * unique within a track (duplicate stamps make which tied fix
    * anchors the next interval order-dependent).
    *
    * Scale shape: the ONLY shuffle is the per-track window for the
    * inter-fix gap, and it runs BEFORE the AOI fan-out (the gap is
    * AOI-independent), so the window carries points rows, not
    * points x |aois|; the fan-out itself is a map-only cross join
    * with the broadcast literal fence list and one winding-kernel
    * call per (fix, AOI), and the final group-by partial-aggregates
    * to |tracks| x |aois| rows.
    */
  def trackDwell(points: DataFrame, trackCol: String, timeCol: String,
                 pointNvec: String, aois: Seq[Aoi],
                 dwellCol: String = "dwell_t"): DataFrame = {
    require(aois.nonEmpty)
    aois.foreach(_.validated) // winding-test hemisphere contract
    val spark = points.sparkSession
    import spark.implicits._
    val vertsDf = broadcast(
      aois.map(a => (a.id, a.flatVerts.toSeq)).toDF("aoi_id", "__verts"))
    val w = Window.partitionBy(col(trackCol)).orderBy(col(timeCol))
    points
      .filter(col(timeCol).isNotNull && col(pointNvec).isNotNull)
      .select(col(trackCol), col(timeCol), col(pointNvec))
      .withColumn("__dt",
        (lead(col(timeCol), 1).over(w) - col(timeCol)).cast("double"))
      .crossJoin(vertsDf)
      .withColumn("__in", cells.pointInPolygon(col(pointNvec), col("__verts")))
      .groupBy(col(trackCol), col("aoi_id"))
      .agg(
        sum(when(col("__in") && col("__dt").isNotNull, col("__dt"))
          .otherwise(0.0)).as(dwellCol),
        count(when(col("__in"), lit(1))).as("fixes_inside"))
  }
}
