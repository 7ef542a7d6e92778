package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Large-scale LLM-dedup probe (VERDICT r3 item 5): run the two
  * banded near-dup joins — `Dedup.minHashPairs` (text MinHash/LSH)
  * and `Dedup.hammingNearDups` (fingerprint multi-index hashing) — at
  * 4M/16M/64M rows over a synthetic corpus with planted duplicate
  * clusters AND a degenerate flood, and record wall time per size so
  * BENCH/BASELINE.md can state measured near-linearity instead of a
  * design argument.
  *
  * Corpus shape (deterministic, id-derived):
  *  - clusters of 5 docs: members 0-3 share the exact text (exercises
  *    the star-encoding path), member 4 differs in one word of ~18
  *    (a genuine near-dup for the banding path);
  *  - every 1000th cluster reuses ONE shared seed — a 0.1% identical-
  *    text flood (the pathological bucket the caps exist for);
  *  - fingerprints: 60-bit cluster hash, members 3/4 one bit flipped
  *    (hamming-1 near-dups for the banding path) plus an all-zero fp
  *    on the flood rows (the "blank frame" phash case).
  *
  * Inputs are materialized to /tmp parquet once per size so the
  * timings measure the OPERATORS, not row generation; each operator
  * timing is min of SPARK_GRAFT_PROBE_ITERS runs (default 2) after a
  * warm-up.
  */
object DedupScaleProbe {
  def corpus(spark: SparkSession, rows: Long, parts: Int): DataFrame = {
    val words = 18
    val base = spark.range(0, rows, 1, parts)
      // integer cluster ordinal (col / 5 alone is DOUBLE division in
      // the Column DSL — the first probe run planted no clusters)
      .withColumn("cluster0", floor(col("id") / 5).cast("long"))
      .withColumn("cluster",
        when(col("cluster0") % 1000 === 0, 0L).otherwise(col("cluster0")))
      .withColumn("member", col("id") % 5)
    // 18 hash-derived words of ~6 chars; member 4 swaps word 7
    val wordCols = (0 until words).map { w =>
      val seed =
        if (w == 7) when(col("member") === 4, xxhash64(col("cluster"), lit(w), lit(991)))
          .otherwise(xxhash64(col("cluster"), lit(w)))
        else xxhash64(col("cluster"), lit(w))
      conv(pmod(seed, lit(56800235584L)).cast("string"), 10, 36)
    }
    base.select(col("id"),
      concat_ws(" ", wordCols: _*).as("text"),
      // 60-bit fingerprint: flood rows all-zero (one giant identical
      // group -> star path), else cluster hash with member-dependent
      // single-bit flips (members 3 and 4 are hamming-1 from the
      // rep, hamming-2 from each other)
      when(col("cluster") === 0, 0L).otherwise(
        pmod(xxhash64(col("cluster"), lit("fp")), lit(1L << 60))
          .bitwiseXOR(
            when(col("member") === 3, 1L << 20)
              .when(col("member") === 4, 1L << 59)
              .otherwise(0L))).as("fp"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_DEDUP_ROWS", "4000000,16000000")
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
      // cache key carries a corpus VERSION: keyed by row count alone,
      // a corpus() change would silently re-benchmark stale parquet
      // from an earlier code version (the v1 corpus planted no
      // clusters — exactly that class of measurement error)
      val path = s"/tmp/graft_dedup_probe_v2_$rows"
      if (!new java.io.File(path + "/_SUCCESS").exists())
        corpus(spark, rows, cpus.toInt * 4).write.mode("overwrite")
          .option("compression", "none").parquet(path)
      val df = spark.read.parquet(path)
      val (mhPairs, mhSec) = time {
        Dedup.minHashPairs(df, "id", "text", threshold = 0.35).count()
      }
      println(f"PROBE minhash rows=$rows pairs=$mhPairs sec=$mhSec%.2f krows_per_sec=${rows / mhSec / 1000}%.0f")
      // maxDist = 1 over the 60-bit fp: auto-banding picks 2 bands of
      // 30 bits, so the random-collision candidate floor
      // (bands * n^2 / 2^31) stays sub-dominant through 64M rows and
      // the timing measures the MACHINERY's growth, not an inherent
      // quadratic floor (see hammingNearDups' sizing-rule scaladoc —
      // maxDist 3 over 64-bit fingerprints stops being an all-pairs
      // problem past ~10M rows no matter the plan)
      val (hdPairs, hdSec) = time {
        Dedup.hammingNearDups(df, "id", "fp", maxDist = 1, bits = 60).count()
      }
      println(f"PROBE hamming rows=$rows pairs=$hdPairs sec=$hdSec%.2f krows_per_sec=${rows / hdSec / 1000}%.0f")
      // cluster resolution over the materialized pair list (the step
      // a real dedup pipeline runs after either pair operator)
      val pairs = Dedup.hammingNearDups(df, "id", "fp", maxDist = 1, bits = 60)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      val (nComp, ccSec) = time {
        val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
        val n = comps.select(countDistinct("component")).collect()(0).getLong(0)
        comps.unpersist(blocking = false)
        n
      }
      pairs.unpersist(blocking = false)
      println(f"PROBE components rows=$rows edges=$hdPairs clusters=$nComp sec=$ccSec%.2f")
    }
    spark.stop()
  }
}
