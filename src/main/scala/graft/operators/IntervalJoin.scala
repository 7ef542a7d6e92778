package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join: all (left, right) pairs whose CLOSED
  * numeric intervals [lStart, lEnd] and [rStart, rEnd] intersect,
  * optionally under equi-keys — the time-range companion of the
  * as-of join (reservations vs outages, sessions vs incidents,
  * validity ranges vs observation windows).
  *
  * Spark-first shape: both sides explode their interval into
  * fixed-width BUCKETS and equi-join on (keys, bucket) — a plain
  * shuffled hash join Catalyst and AQE handle like any other — then
  * the exact overlap predicate filters and a RESPONSIBILITY rule
  * keeps each pair exactly once: only the bucket containing the
  * later of the two starts counts (that bucket is shared whenever
  * the intervals overlap, since max(start) <= min(end)). No range
  * join, no cross product, no dedup shuffle.
  *
  * Bucketing is floor(value / width) in double arithmetic: division
  * and floor are monotone, both sides bucket the same value
  * identically, and the responsibility bucket max(b(lS), b(rS)) is
  * provably inside both exploded ranges — correctness never depends
  * on where FP rounding lands a boundary. Values must stay within
  * 2^53 in magnitude (exact doubles; epoch millis are).
  *
  * Scale: per-row fan-out = interval length / bucketWidth + 1.
  * Choose bucketWidth near the TYPICAL interval length (fan-out
  * ~2×); a row spanning more than `maxBucketsPerRow` buckets fails
  * LOUDLY (`raise_error`) rather than silently exploding the
  * shuffle — re-run with a wider bucket.
  */
object IntervalJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   bucketWidth: Double,
                   keys: Seq[(String, String)] = Nil,
                   maxBucketsPerRow: Int = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"intervalJoin: column names must be disjoint; both sides have ${dup.mkString(", ")}")
    val reserved = Seq("__b0", "__b1", "__bkt", "__rb0")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"intervalJoin: columns ${clash.mkString(", ")} collide with internal names")

    def bkt(c: Column): Column =
      floor(c.cast("double") / lit(bucketWidth)).cast("long")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__b0", bkt(col(s)))
      .withColumn("__b1",
        when(bkt(col(e)) - bkt(col(s)) >= maxBucketsPerRow,
          raise_error(concat(lit(s"intervalJoin: a row spans >= $maxBucketsPerRow " +
            s"buckets of width $bucketWidth — widen bucketWidth ("), col(s),
            lit(".."), col(e), lit(")"))))
          .otherwise(bkt(col(e))))
      .withColumn("__bkt", explode(sequence(col("__b0"), col("__b1"))))

    val l = exploded(left, lStart, lEnd)
    val r = exploded(right, rStart, rEnd).withColumnRenamed("__b0", "__rb0")
    val cond = keys.map { case (lk, rk) => l(lk) === r(rk) }
      .foldLeft(l("__bkt") === r("__bkt"))(_ && _)
    l.join(r, cond)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        l("__bkt") === greatest(l("__b0"), col("__rb0")))
      .drop("__b0", "__b1", "__rb0")
      .drop(l("__bkt")).drop(r("__bkt"))
  }
}
