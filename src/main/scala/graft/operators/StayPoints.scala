package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.geo

/** Stay-point detection over position tracks (Li et al. 2008 "Mining
  * user similarity based on location history" anchor semantics,
  * re-expressed relationally): a fix is a STAY ANCHOR when the track
  * remains within `radiusMeters` great-circle distance of it for at
  * least `minDwellMs` — the dwell/visit primitive for trajectory
  * mining on the n-vector positions this engine indexes (reference
  * scope: the same GeoPath/track layer as course-over-ground,
  * envector nvector/_core.py great-circle chain).
  *
  * Anchor definition (exactly Li's "first radius exceedance at or
  * after t + minDwell", decomposed into join-friendly clauses):
  *  - (1) every same-track fix j with t < t_j <= t + minDwellMs lies
  *    within radiusMeters of the anchor fix, and
  *  - (2) some same-track fix has t_j >= t + minDwellMs (the dwell
  *    window is fully observed — a track that simply ENDS inside the
  *    window has unknown dwell and is not an anchor).
  *
  * Spark-first scale shape: the window scan is a TIME-BUCKET
  * equi-join, not a per-track fan-out — fixes key on
  * (track, floor(t / minDwellMs)); every successor inside an
  * anchor's window lies in the anchor's own bucket or the next one,
  * so the anchor side explodes to exactly 2 bucket keys and the
  * candidate volume per anchor is bounded by the track's fix count
  * inside ONE dwell window (fix-rate x minDwell), never the whole
  * track. Condition (2) rides the same pre-join track window that
  * needs only a per-track max. A pathologically hot (track, bucket)
  * cell (a vehicle parked on a massive fix rate) is the same skew
  * class as a hot spatial cell — AQE splits the shuffle partition,
  * and the per-bucket candidate bound caps the blowup.
  *
  * Output: every input fix with `is_stay` (boolean), `n_window`
  * (successors inside the dwell window) and `max_excursion_m` (their
  * max distance, null when none).
  */
object StayPoints {

  def stayAnchors(df: DataFrame, trackCol: String, idCol: String,
                  tMsCol: String, nvecCol: String,
                  radiusMeters: Double, minDwellMs: Long,
                  sphereRadius: Double = graft.geo.Ellipsoids.MeanEarthRadius): DataFrame = {
    require(radiusMeters >= 0, s"radius must be >= 0 m (got $radiusMeters)")
    require(minDwellMs > 0, s"minDwellMs must be > 0 (got $minDwellMs)")
    val reserved = Seq("__b", "__t2", "__n2", "__d", "is_stay", "n_window", "max_excursion_m")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"stayAnchors: input columns ${clash.mkString(", ")} collide with outputs/internals")

    val wTrack = Window.partitionBy(trackCol)
    // null-time AND null-position fixes are dropped (same contract as
    // speedFlags/geofence): a null-position successor inside the
    // window would yield a null __d that max() silently skips, so
    // max_excursion_m would understate and is_stay could assert a
    // dwell the data never observed
    val observed = df.filter(col(tMsCol).isNotNull && col(nvecCol).isNotNull)
    val base = observed
      .withColumn("__tmax", max(col(tMsCol)).over(wTrack))
    // anchors probe their own bucket and the next; successors carry one
    val probes = base.withColumn("__b",
      explode(array(floor(col(tMsCol) / minDwellMs),
        floor(col(tMsCol) / minDwellMs) + 1)))
    val succ = observed
      .select(col(trackCol).as("__trk2"),
        col(tMsCol).as("__t2"), col(nvecCol).as("__n2"))
      .withColumn("__b", floor(col("__t2") / minDwellMs))
    val joined = probes.join(succ,
      probes(trackCol) === succ("__trk2") && probes("__b") === succ("__b") &&
        col("__t2") > col(tMsCol) && col("__t2") <= col(tMsCol) + minDwellMs,
      "left_outer")
      .withColumn("__d", geo.gcDistance(col(nvecCol), col("__n2"), sphereRadius))
    // each successor matches through exactly one bucket key, so the
    // per-anchor aggregate needs no pair dedup; grouping on the anchor
    // id collapses the 2-way bucket explode too
    joined
      .groupBy(col(trackCol), col(idCol))
      .agg(
        first(col(tMsCol)).as(tMsCol),
        first(col(nvecCol)).as(nvecCol),
        first(col("__tmax")).as("__tmax"),
        count(col("__t2")).as("n_window"),
        max(col("__d")).as("max_excursion_m"))
      .withColumn("is_stay",
        (col("max_excursion_m").isNull || col("max_excursion_m") <= radiusMeters) &&
          col("__tmax") >= col(tMsCol) + minDwellMs)
      .drop("__tmax")
  }
}
