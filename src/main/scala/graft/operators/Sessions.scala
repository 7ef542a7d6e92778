package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-gap sessionization: group each key's event stream into
  * sessions separated by quiet gaps longer than `maxGapMs` — the
  * standard clickstream / telemetry / training-log operator
  * (reference scope: per-track grouping as in envector's GeoPath
  * track segmentation, generalized to any keyed event table).
  *
  * Spark-first shape: ONE hash shuffle on the key + one
  * per-partition sort drives everything — the boundary flag is a
  * `lag` comparison, the session index its running sum, and
  * [[sessionStats]]' aggregation groups on (key, session) which
  * hash-partitioning on key already satisfies (ClusteredDistribution
  * by a subset), so the stats add NO second exchange. Cost is
  * O(n log n) per partition regardless of gap width or session
  * count; nothing is ever materialized per-session on the driver.
  *
  * At 100 TB the only hazard is a single key owning a giant event
  * stream (the window sort is per-key sequential); for jumbo keys
  * pre-split by coarse time bucket, sessionize within buckets, and
  * stitch only the bucket-boundary sessions (two-phase merge) — the
  * operator keeps the simple exact form because real keyed streams
  * (user, device, vehicle) are bounded per key.
  *
  * Contracts:
  *  - rows with a null timestamp are DROPPED (a null time has no
  *    position in the gap ordering; silently seeding a session with
  *    it would corrupt every later index of that key);
  *  - ties at equal timestamp always land in the same session (gap 0
  *    <= any maxGap), so the assignment is deterministic even though
  *    the sort order among ties is not;
  *  - session indices are 1-based and dense per key in time order.
  */
object Sessions {

  /** Adds `sessionCol`: 1-based dense session index per key. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 maxGapMs: Long, sessionCol: String = "session_idx"): DataFrame = {
    require(maxGapMs >= 0, s"maxGapMs must be >= 0 (got $maxGapMs)")
    // cast is a no-op for TIMESTAMP and maps TIMESTAMP_NTZ through the
    // session timezone (keep it UTC for engine-independent millis)
    val ms = unix_millis(col(tsCol).cast("timestamp"))
    // order by the SAME millis expression the gap uses — ordering by
    // the raw column would sort castable string timestamps
    // lexicographically and misplace session boundaries
    val w = Window.partitionBy(keyCol).orderBy(ms)
    val cum = Window.partitionBy(keyCol).orderBy(ms)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(ms, 1).over(w)
    val boundary = when(prev.isNull || ms - prev > maxGapMs, 1L).otherwise(0L)
    df.filter(col(tsCol).isNotNull)
      .withColumn(sessionCol, sum(boundary).over(cum))
  }

  /** One row per (key, session): event count, start/end epoch millis,
    * duration. Same single exchange as [[sessionize]].
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   maxGapMs: Long): DataFrame =
    sessionize(df, keyCol, tsCol, maxGapMs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis(col(tsCol).cast("timestamp"))).as("start_ms"),
        max(unix_millis(col(tsCol).cast("timestamp"))).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
}
