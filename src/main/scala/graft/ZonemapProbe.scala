package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.index.cells
import graft.sources.SnapshotStore

/** Zone-map data-skipping probe: commit a multi-million-row
  * tile-clustered snapshot (the PipelineMain stage-3 layout), then
  * compare a tile-range read via manifest pruning (readPruned)
  * against the same filter over a full scan. Prints files touched and
  * wall time for both — the evidence that manifest min/max stats turn
  * tile-scoped reads into a few-file operation (BENCH/BASELINE.md).
  */
object ZonemapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "4000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 128) // 128 data files
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"/tmp/graft_zonemap_probe_$rows"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val store = new SnapshotStore(spark, root)
    val pts = spark.range(rows)
      .withColumn("lat", SparkEntry.latRad(col("id"))) // shared overflow-safe position hash
      .withColumn("lon", SparkEntry.lonRad(col("id")))
      .withColumn("n", geo.nvec(col("lat"), col("lon")))
      .withColumn("tile", cells.cellAt(col("n"), 8))
      .select(col("id"), col("tile"),
        round(col("lat"), 8).as("lat"), round(col("lon"), 8).as("lon"))
      .repartitionByRange(128, col("tile"))
    val t0 = System.nanoTime()
    val v = store.commit("tiled", pts, Some("tile"))
    println(f"PROBE commit rows=$rows files=128 sec=${(System.nanoTime() - t0) / 1e9}%.2f")

    // a ~0.5%-of-rows contiguous tile slice (one spatial region under
    // the range-clustered layout), picked from the data's own
    // quantiles so the range is guaranteed populated
    val allTiles = store.fileMetrics(v)
    val qs = store.read("tiled").stat
      .approxQuantile("tile", Array(0.500, 0.505), 1e-4)
    val (qLo, qHi) = (qs(0).toLong, qs(1).toLong)

    def time(f: => (Long, Double)): (Long, Double, Double) = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t1 = System.nanoTime(); val r = f; (r._1, r._2, (System.nanoTime() - t1) / 1e9)
      }
      (ts.head._1, ts.head._2, ts.map(_._3).sorted.apply(1))
    }
    // the consumer aggregates a payload column, so the scan reads and
    // decodes real data, not just footer counts
    val (nFull, sFull, tFull) = time {
      val r = store.read("tiled").filter(col("tile").between(qLo, qHi))
        .agg(count(lit(1)), sum("lat")).collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    val pruned = store.prunedFiles(v, qLo, qHi)
    val (nPruned, sPruned, tPruned) = time {
      val r = store.readPruned("tiled", qLo, qHi)
        .agg(count(lit(1)), sum("lat")).collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    // relative tolerance: double summation order differs between the
    // two scans, and the absolute error grows with row count
    require(nFull == nPruned && nFull > 0 &&
        math.abs(sFull - sPruned) <= 1e-9 * math.max(1.0, math.abs(sFull)) * math.log(nFull + 2.0),
      s"pruned read ($nPruned rows, sum $sPruned) != full scan ($nFull rows, sum $sFull)")
    println(f"PROBE range=[$qLo,$qHi] rows=$nFull files_full=${allTiles.size} " +
      f"files_pruned=${pruned.size} t_full=${tFull}%.2f t_pruned=${tPruned}%.2f " +
      f"speedup=${tFull / tPruned}%.1fx")
    spark.stop()
  }
}
