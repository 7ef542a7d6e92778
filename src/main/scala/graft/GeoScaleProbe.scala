package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Raster, SpatialJoins}

/** Scale probe for the round-4 spatial operators — geodesic DBSCAN,
  * snap-to-route, and IDW interpolation — at millions of points, so
  * BENCH/BASELINE.md states measured growth instead of a design
  * argument.
  *
  * Point cloud (deterministic, id-derived): every 100th row belongs
  * to one of 1000 dense blobs (members within ~5 km of the blob
  * center — pairwise within the 10 km eps, so each blob is a clique
  * and must resolve to exactly one DBSCAN cluster); the other 99%
  * scatter uniformly (expected eps-degree ~2.5 at 4M rows — noise or
  * thin borders at minPts 10). The construction pins the expected
  * cluster count, so the probe REQUIRES ~1000 clusters at every
  * size rather than just timing.
  */
object GeoScaleProbe {

  def cloud(spark: SparkSession, rows: Long, parts: Int): DataFrame = {
    import graft.functions.geo
    val base = spark.range(0, rows, 1, parts)
      .withColumn("blob", when(col("id") % 100 === 0,
        pmod(col("id") / 100, lit(1000L))).otherwise(lit(-1L)))
    def u(tag: String, c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c, lit(tag)), lit(1000000L)) / 1000000.0
    val blobLat = asin(u("blat", col("blob")) * 1.6 - 0.8)
    val blobLon = (u("blon", col("blob")) * 2.0 - 1.0) * lit(math.Pi)
    // ~5 km offsets (4.5e-4 rad * ~cos compensation ignored: blob
    // centers stay below |lat| 53 deg so lon offsets stay sub-eps)
    val offLat = (u("olat", col("id")) * 2.0 - 1.0) * 4.5e-4
    val offLon = (u("olon", col("id")) * 2.0 - 1.0) * 4.5e-4
    val scatLat = asin(u("slat", col("id")) * 2.0 - 1.0)
    val scatLon = (u("slon", col("id")) * 2.0 - 1.0) * lit(math.Pi)
    base.select(col("id"),
      geo.nvec(
        when(col("blob") >= 0, blobLat + offLat).otherwise(scatLat),
        when(col("blob") >= 0, blobLon + offLon).otherwise(scatLon)).as("n"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_GEO_ROWS", "1000000,4000000")
      .split(',').map(_.trim.toLong)
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "2").toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      (ts.head._1, ts.map(_._2).min)
    }
    val routes = Seq(
      SpatialJoins.Route("r1", Seq((0.0, 0.0), (10.0, 10.0), (10.0, 25.0), (20.0, 40.0))),
      SpatialJoins.Route("r2", Seq((-30.0, -60.0), (-10.0, -55.0), (5.0, -40.0))),
      SpatialJoins.Route("r3", Seq((40.0, 100.0), (50.0, 120.0), (45.0, 140.0))))
    for (rows <- sizes) {
      require(rows >= 800000,
        s"probe construction needs >= 800k rows for >= 8 members per " +
          s"planted blob (got $rows) — the cluster-count check below " +
          "would fail on the INPUT, not the machinery")
      val path = s"/tmp/graft_geo_probe_v1_$rows"
      if (!new java.io.File(path + "/_SUCCESS").exists())
        cloud(spark, rows, cpus.toInt * 4).write.mode("overwrite")
          .option("compression", "none").parquet(path)
      val df = spark.read.parquet(path)

      val ((pts, clusters), dbSec) = time {
        // pinned to the contraction plan: this probe's numbers track
        // the contraction machinery across rounds, and its small
        // blobs would otherwise dispatch to the member-pair plan
        val out = Clustering.dbscan(df, "id", "n", 10e3, 10,
          pairwiseBudget = -1L)
        val n = out.count()
        // clusters of >= 8 cores: the planted blobs (10-40 members,
        // all cores by construction). Dense-scatter flukes DO reach
        // core degree (~0.1% of 4M at eps-degree lambda 2.5) but
        // form singletons/short chains, never 8-core components.
        val c = out.filter(col("kind") === "core")
          .groupBy("cluster").count().filter(col("count") >= 8).count()
        out.unpersist()
        (n, c)
      }
      require(clusters >= 950 && clusters <= 1050,
        s"planted 1000 blob cliques, resolved $clusters >=8-core clusters")
      println(f"PROBE dbscan rows=$rows out=$pts clusters=$clusters sec=$dbSec%.2f krows_per_sec=${rows / dbSec / 1000}%.0f")

      // noop sink, not count(): these are map-only/prunable plans and
      // count() would let Catalyst skip the kernels entirely
      val (_, snapSec) = time {
        SpatialJoins.snapToRoutes(df, "n", routes)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE snap rows=$rows sec=$snapSec%.2f krows_per_sec=${rows / snapSec / 1000}%.0f")

      val samples = df.filter(col("id") % 40 === 1)
        .select(col("n").as("sn"), (col("id") % 97).cast("double").as("v"))
      val (_, idwSec) = time {
        Raster.idw(df, "n", samples, "sn", "v", radiusMeters = 100e3)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE idw rows=$rows sec=$idwSec%.2f krows_per_sec=${rows / idwSec / 1000}%.0f")

      // --- round-4 late additions ------------------------------------
      // lat/lon back out of the unit n-vector (assign takes radians)
      val ll = df
        .withColumn("lat", asin(col("n.z")))
        .withColumn("lon", atan2(col("n.y"), col("n.x")))
      // web-mercator multi-zoom assignment: map-only, 9 rows out per
      // row in (zooms 4..12); the probe measures the one-projection +
      // shift/substring fan-out, the operator's whole cost model
      val (_, tileSec) = time {
        graft.index.WebMercator.assign(ll, "lat", "lon",
            finest = 12, coarsest = 4)
          .select("zoom", "tx", "ty", "qk")
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE tiles rows=$rows sec=$tileSec%.2f krows_per_sec=${rows / tileSec / 1000}%.0f")

      // grid KDE at level 7 (98k cells, ~all occupied at 4M rows):
      // one count shuffle + the 81-cell ring explode over CELL rows
      val (kdeCells, kdeSec) = time {
        val out = Raster.kdeDensity(df, "n", level = 7,
          sigmaMeters = 50e3, cutoffMeters = 150e3)
        out.count()
      }
      println(f"PROBE kde rows=$rows cells=$kdeCells sec=$kdeSec%.2f krows_per_sec=${rows / kdeSec / 1000}%.0f")

      // tracks: 1024 tracks of rows/1024 points, id as the time axis
      val tracks = ll.withColumn("tid", col("id") % 1024)
      val fences = Seq(
        SpatialJoins.Aoi("f1", Seq((-5.0, -5.0), (-5.0, 5.0), (5.0, 5.0), (5.0, -5.0))),
        SpatialJoins.Aoi("f2", Seq((20.0, 60.0), (20.0, 80.0), (40.0, 80.0), (40.0, 60.0))),
        SpatialJoins.Aoi("f3", Seq((-50.0, -120.0), (-50.0, -100.0), (-30.0, -100.0), (-30.0, -120.0))))
      val (gfEvents, gfSec) = time {
        SpatialJoins.geofenceTransitions(tracks, "tid", "id", "n", fences).count()
      }
      println(f"PROBE geofence rows=$rows events=$gfEvents sec=$gfSec%.2f krows_per_sec=${rows / gfSec / 1000}%.0f")

      val (_, spdSec) = time {
        operators.Tracks.speedFlags(tracks.withColumn("t", col("id").cast("double")),
            "tid", "t", "n", maxSpeedMps = 1e6)
          .select("tid", "t", "speed_mps", "too_fast")
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE speed rows=$rows sec=$spdSec%.2f krows_per_sec=${rows / spdSec / 1000}%.0f")

      // DTW: 64 explicit pairs of ~rows/4096-point tracks — the probe
      // scales the PAIR DP volume (sum |A|*|B|) linearly with rows^2 /
      // 4096^2, so krows_per_sec is reported against DP cells
      val dtwTracks = ll.withColumn("tid", col("id") % 4096)
        .filter(col("tid") < 128)
      val dtwPairs = spark.range(0, 64)
        .select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
      val trackLen = rows / 4096
      val dpCells = 64L * trackLen * trackLen
      val (_, dtwSec) = time {
        operators.TrajectoryDist.dtw(dtwTracks, "tid", "id", "n",
            dtwPairs, "a", "b")
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE dtw rows=$rows pairs=64 track_len=$trackLen dp_cells=$dpCells sec=$dtwSec%.2f mcells_per_sec=${dpCells / dtwSec / 1e6}%.0f")
    }
    spark.stop()
  }
}
