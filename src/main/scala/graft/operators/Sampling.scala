package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's own
  * `df.sample` is seed-deterministic only for a FIXED partitioning —
  * repartition the input (or re-run at another parallelism) and the
  * sampled set changes, which breaks resumable pipelines and
  * cross-run diffing. These operators key every decision on a hash
  * of a row id instead: the sample is a pure function of the data,
  * reproducible across cluster sizes, file layouts, and engines
  * (the DuckDB oracle draws the identical rows).
  *
  * Scale shape: [[hashSample]] is map-only — a filter on a scalar
  * hash, no shuffle, no state, prunes at full scan speed.
  * [[stratifiedSample]] is one hash shuffle on the strata columns +
  * a per-partition sort (rank window), the exact-quota form; its
  * per-stratum sort is the honest cost of exactness — for quotas
  * where an approximate Bernoulli rate per stratum suffices, compose
  * `hashSample` with a per-stratum fraction instead and skip the
  * shuffle entirely.
  */
object Sampling {

  /** Uniform [0,1) from the md5 of (id, salt): the top 60 bits of the
    * digest as a long over 2^60. md5 rather than xxhash64 so the
    * draw is reproducible OUTSIDE Spark too (the oracle's DuckDB
    * mirror: `('0x' || substr(md5(...), 1, 15))::BIGINT`); for
    * engine-internal sampling where cross-engine replay is not
    * needed, swapping in xxhash64 is ~10x cheaper per row.
    */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 15), 16, 10)
      .cast("long").cast("double") / math.pow(2.0, 60.0)

  /** Keep each row iff hashUniform(id) < fraction — deterministic
    * Bernoulli(fraction) independent of partitioning.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1] (got $fraction)")
    df.filter(hashUniform(col(idCol), salt) < fraction)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller):
    * rank rows within each stratum by (hash, id) and keep rank <= n.
    * The (hash, id) order makes the draw uniform-without-replacement
    * AND total (id breaks hash ties), so the selected set is unique
    * and engine-independent.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       n: Int, salt: String = "graft"): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSample needs >= 1 strata column")
    require(n >= 0, s"per-stratum quota must be >= 0 (got $n)")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashUniform(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .drop("__r")
  }
}
