package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.AsOfJoin

/** Scale probe for [[AsOfJoin]]: the operator's 100-TB claim is that
  * cost is O((|L|+|R|) log) PER KEY-SHUFFLE regardless of tolerance
  * width, where the relational range-join + rank form fans out every
  * in-window candidate pair first. This probe measures both claims:
  *
  *  1. asOfJoin wall time at 4M/16M/64M left+right rows — near-linear
  *     growth;
  *  2. the SAME join at a 1e3-ms vs a 1e8-ms tolerance — near-equal
  *     wall time (the range join's candidate volume grows ~1e5x);
  *  3. at the smallest size, the range-join + rank mirror on the
  *     NARROW tolerance (exact same matched rows — correctness
  *     cross-check) with its exploded candidate count, plus the
  *     analytic candidate count the WIDE tolerance would explode to
  *     (sum_k |L_k|*|R_k|) — the leg that is infeasible to run.
  *
  * Deterministic id-derived data: rows/1000 keys, times uniform in a
  * 1e9-ms span (hash lanes), payload = id.
  */
object AsOfScaleProbe {
  def tables(spark: SparkSession, rows: Long, parts: Int): (DataFrame, DataFrame) = {
    val nKeys = math.max(rows / 1000, 1)
    def gen(seed: Int) = spark.range(0, rows, 1, parts)
      .withColumn("k", pmod(xxhash64(col("id"), lit(seed)), lit(nKeys)))
      .withColumn("t", pmod(xxhash64(col("id"), lit(seed + 1)), lit(1000000000L)))
    (gen(1).select(col("id"), col("k"), col("t")),
     gen(2).select(col("k"), col("t").as("rt"), col("id").as("v")))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_ASOF_ROWS", "4000000,16000000")
      .split(',').map(_.trim.toLong)
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): (Long, Double) = {
      f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }
      (ts.head._1, ts.map(_._2).min)
    }
    for (rows <- sizes) {
      val path = s"/tmp/graft_asof_probe_v1_$rows"
      if (!new java.io.File(path + "/_SUCCESS").exists()) {
        val (l, r) = tables(spark, rows, cpus.toInt * 4)
        l.write.mode("overwrite").option("compression", "none").parquet(path + "/l")
        r.write.mode("overwrite").option("compression", "none").parquet(path + "/r")
        // one _SUCCESS for both legs
        new java.io.FileOutputStream(path + "/_SUCCESS").close()
      }
      val l = spark.read.parquet(path + "/l")
      val r = spark.read.parquet(path + "/r")
      for (tol <- Seq(1e3, 1e8)) {
        val (matched, sec) = time {
          AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", "backward", Some(tol))
            .filter(col("r_v").isNotNull).count()
        }
        println(f"PROBE asof rows=$rows tol=${tol.toLong} matched=$matched sec=$sec%.2f krows_per_sec=${rows / sec / 1000}%.0f")
      }
      if (rows == sizes.min) {
        val tol = 1e3
        val cand = l.join(r, l("k") === r("k") && col("rt") <= col("t") &&
          col("t") - col("rt") <= tol)
        val (nCand, candSec) = time(cand.count())
        val (nRanked, rankSec) = time {
          cand.withColumn("__rn", row_number().over(
              Window.partitionBy("id").orderBy(col("rt").desc, col("v").desc)))
            .filter(col("__rn") === 1).count()
        }
        val asofMatched = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt",
            "backward", Some(tol))
          .filter(col("r_v").isNotNull).count()
        require(nRanked == asofMatched,
          s"range-join+rank mirror disagrees: $nRanked vs $asofMatched")
        // what the WIDE range join would have to fan out
        val lk = l.groupBy("k").count().withColumnRenamed("count", "nl")
        val rk = r.groupBy("k").count().withColumnRenamed("count", "nr")
        val wideCand = lk.join(rk, "k")
          .agg(sum(col("nl") * col("nr"))).collect()(0).getLong(0)
        println(f"PROBE asof-vs-rangejoin rows=$rows tol=${tol.toLong} candidates=$nCand cand_sec=$candSec%.2f rank_sec=$rankSec%.2f matched_equal=true wide_candidates_analytic=$wideCand")
      }
    }
    spark.stop()
  }
}
