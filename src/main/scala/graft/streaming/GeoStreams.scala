package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.functions.geo
import graft.index.cells
import graft.sources.SnapshotStore

/** Structured-Streaming forms of the pipeline stages. The geodesy
  * kernels are stateless expressions, so the same Column DSL runs
  * unchanged under `readStream`; these helpers add the stateful
  * pieces: watermarked dedup and windowed per-cell aggregation
  * (SURVEY.md §2.10 streaming row).
  */
object GeoStreams {

  /** Drop duplicate image ids within the watermark horizon (the
    * streaming ingest guard for the image+caption table).
    */
  def dedupeByIdStream(stream: DataFrame, idCol: String, tsCol: String,
                       watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Event-time windowed counts + mean position per cell: the
    * streaming tile-statistics operator.
    */
  def cellCountsStream(stream: DataFrame, nvecCol: String, tsCol: String,
                       level: Int, windowDuration: String,
                       watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .withColumn("cell", cells.cellAt(col(nvecCol), level))
      .groupBy(window(col(tsCol), windowDuration), col("cell"))
      .agg(count(lit(1)).as("n"),
        geo.meanPosition(col(nvecCol)).as("mean_n"))
      .select(col("window.start").as("window_start"), col("cell"), col("n"),
        round(geo.latDeg(col("mean_n")), 6).as("mean_lat"),
        round(geo.lonDeg(col("mean_n")), 6).as("mean_lon"))

  final case class Fix(track: Long, t: Double, x: Double, y: Double, z: Double)
  final case class Cog(track: Long, t: Double, cog_rad: Double)

  /** Streaming course over ground via custom state
    * (flatMapGroupsWithState): per track, keep the last fix and emit
    * the ellipsoid-exact bearing from it to each newly arrived fix.
    * The streaming form of [[graft.operators.Tracks.courseOverGround]]
    * for the common monotone-feed case (fixes per track arrive in
    * time order; the batch operator remains the replay/backfill path
    * where midpoint smoothing needs both neighbors).
    *
    * State is ONE fix per track. In production pass
    * `idleTimeout = Some("1 hour")` so dead tracks' state expires
    * (an unbounded track universe must not accumulate state forever);
    * note that a processing-time timeout makes the engine schedule
    * continuous no-data micro-batches to fire expirations, so
    * test-style `processAllAvailable()` never settles with it — hence
    * opt-in rather than default.
    *
    * Input columns: (trackCol: long, tCol: double, nvecCol struct).
    */
  def courseOverGroundStream(stream: DataFrame, trackCol: String,
                             tCol: String, nvecCol: String,
                             idleTimeout: Option[String] = None): Dataset[Cog] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream.select(col(trackCol).cast("long").as("track"),
        col(tCol).cast("double").as("t"),
        col(nvecCol).getField("x").as("x"),
        col(nvecCol).getField("y").as("y"),
        col(nvecCol).getField("z").as("z"))
      .as[Fix]
      .groupByKey(_.track)
      .flatMapGroupsWithState[Fix, Cog](OutputMode.Append(), timeoutConf) {
        (track: Long, fixes: Iterator[Fix], state: GroupState[Fix]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = fixes.toArray.sortBy(_.t)
            var last = state.getOption
            val out = sorted.iterator.flatMap { f =>
              // cross-batch stragglers: a fix at or before the carried
              // state's time is either a reversed leg (older) or an
              // at-least-once redelivery (equal t — emitting it would
              // produce a bogus zero-distance bearing); drop both
              // (sorting only orders within the batch, it cannot see
              // earlier batches)
              if (last.exists(_.t >= f.t)) Iterator.empty
              else {
                val bearing = last.map { p =>
                  Cog(track, f.t, graft.geo.Gade.azimuth(
                    graft.geo.Vec3(p.x, p.y, p.z), graft.geo.Vec3(f.x, f.y, f.z)))
                }
                last = Some(f)
                bearing
              }
            }.toVector
            last.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** STREAM-STREAM distance join: all (left, right) pairs within
    * `radiusMeters` great-circle distance AND `maxTimeDiff` event
    * time of each other. The batch candidate->verify pattern
    * ([[graft.operators.SpatialJoins.distanceJoin]]) carries over
    * unchanged: the left stream probes the 3x3 ring of its cell at a
    * level whose 1-ring provably covers the radius
    * (CellIndex.levelForRadiusSafe), the right stream keeps exactly
    * ONE cell (so no pair dedup is needed), and the equi-join key
    * plus the two-sided event-time bound is exactly the shape
    * Spark's stream-stream join needs to bound state: each side's
    * rows are dropped once the other side's watermark passes
    * `maxTimeDiff`. Output: left + right columns + `distCol`,
    * append-mode capable.
    */
  def distanceJoinStream(left: DataFrame, right: DataFrame,
                         leftNvec: String, rightNvec: String,
                         leftTs: String, rightTs: String,
                         radiusMeters: Double, watermark: String,
                         maxTimeDiff: String,
                         sphereRadius: Double = graft.geo.Ellipsoids.MeanEarthRadius,
                         distCol: String = "dist_m"): DataFrame = {
    require(radiusMeters >= 0, s"radius must be >= 0 m (got $radiusMeters)")
    // shared names would resolve ambiguously through the join and the
    // distance projection — fail fast with the remedy (self-proximity:
    // rename one side, e.g. s.toDF(s.columns.map("r_" + _): _*))
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"left/right streams share column names ${overlap.mkString(", ")}; " +
        "rename one side before calling")
    val level = graft.index.CellIndex.levelForRadiusSafe(
      radiusMeters / sphereRadius, k = 1)
    // the batch join falls back to disc covers / cross join beyond
    // ring coverage; neither shape is stream-stream joinable, so
    // refuse loudly instead of building garbage level -1 cells
    require(level > 0,
      f"radius ${radiusMeters}%.0f m exceeds what a 1-ring block can provably " +
        "cover (~1660 km); stream-stream distance joins need the ring regime")
    val l = left.withWatermark(leftTs, watermark)
      .withColumn("__cell",
        explode(cells.ringCells(cells.cellAt(col(leftNvec), level), 1)))
    val r = right.withWatermark(rightTs, watermark)
      .withColumn("__cell_r", cells.cellAt(col(rightNvec), level))
    l.join(r, col("__cell") === col("__cell_r") &&
        col(leftTs).between(
          col(rightTs) - expr(s"INTERVAL $maxTimeDiff"),
          col(rightTs) + expr(s"INTERVAL $maxTimeDiff")))
      .withColumn(distCol, geo.gcDistance(col(leftNvec), col(rightNvec), sphereRadius))
      .filter(col(distCol) <= radiusMeters)
      .drop("__cell", "__cell_r")
  }

  /** Ingest a deduplicated image stream into the snapshot store:
    * each micro-batch commits a named snapshot (per-file row counts +
    * lineage recorded), so the table history is the stream's commit
    * log and a crashed job resumes from its streaming checkpoint +
    * last committed snapshot. IDEMPOTENT under micro-batch replay:
    * foreachBatch can re-deliver a batch whose commit already
    * succeeded (crash between the data commit and Spark's own offset
    * commit), so a batch whose batchId-keyed snapshot name already
    * exists is skipped — without that check a replay would create a
    * duplicate version and double-count the batch in lineage sums.
    *
    * `trigger` defaults to AvailableNow (drain-and-stop — the batch
    * backfill/test shape); pass `Trigger.ProcessingTime(...)` for a
    * continuously running ingest.
    */
  def ingestToSnapshots(stream: DataFrame, idCol: String, tsCol: String,
                        watermark: String, store: SnapshotStore,
                        name: String, checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedupeByIdStream(stream, idCol, tsCol, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val snapName = f"$name%s_batch_$batchId%05d"
        if (!batch.isEmpty && store.versionOf(snapName).isEmpty) {
          store.commit(snapName, batch)
          ()
        }
      }
      .trigger(trigger)
      .start()
}
