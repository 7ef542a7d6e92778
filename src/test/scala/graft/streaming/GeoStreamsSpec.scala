package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.SparkTestSession
import graft.functions.geo

class GeoStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming dedup by image id within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double, Double)]
    val df = input.toDF().toDF("image_id", "ts", "latd", "lond")
    val deduped = GeoStreams.dedupeByIdStream(df, "image_id", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    input.addData(("img_a", ts(0), 1.0, 2.0), ("img_b", ts(1), 3.0, 4.0),
      ("img_a", ts(2), 1.0, 2.0))
    q.processAllAvailable()
    input.addData(("img_b", ts(3), 3.0, 4.0), ("img_c", ts(4), 5.0, 6.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("image_id")
      .collect().map(_.getString(0)).sorted.toSeq
    q.stop()
    assert(ids == Seq("img_a", "img_b", "img_c"))
  }

  test("streaming ingest commits deduplicated snapshots and resumes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream_snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val store = new graft.sources.SnapshotStore(spark, root)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("image_id", "ts", "v")
    input.addData(("a", ts(0), 1.0), ("b", ts(1), 2.0), ("a", ts(2), 1.0))
    val q = GeoStreams.ingestToSnapshots(df, "image_id", "ts", "10 minutes",
      store, "imgs", ckpt)
    q.awaitTermination()
    val committed = store.snapshots.map(_._2)
    assert(committed.exists(_.startsWith("imgs_batch_")))
    val total = committed.filter(_.startsWith("imgs_batch_"))
      .map(store.read(_).count()).sum
    assert(total == 2, s"dedup failed: $total rows committed") // a deduped
    // resume: new data, same checkpoint — only the new rows commit
    input.addData(("b", ts(3), 2.0), ("c", ts(4), 3.0))
    val q2 = GeoStreams.ingestToSnapshots(df, "image_id", "ts", "10 minutes",
      store, "imgs", ckpt)
    q2.awaitTermination()
    val total2 = store.snapshots.map(_._2).filter(_.startsWith("imgs_batch_"))
      .map(store.read(_).count()).sum
    assert(total2 == 3, s"expected one new unique row, got $total2")
  }

  test("streaming windowed cell counts with mean position") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val df = input.toDF().toDF("id", "ts", "latd", "lond")
      .withColumn("n", geo.nvecDeg(col("latd"), col("lond")))
    val counts = GeoStreams.cellCountsStream(df, "n", "ts", 4, "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("cell_out")
      .outputMode("complete").start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    // three points in one cell neighborhood + one far away
    input.addData((1L, ts(0), 10.0, 10.0), (2L, ts(1), 10.01, 10.01),
      (3L, ts(2), 10.02, 9.99), (4L, ts(3), -45.0, -120.0))
    q.processAllAvailable()
    val rows = spark.table("cell_out").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("n")).sum == 4)
    val big = rows.maxBy(_.getAs[Long]("n"))
    assert(big.getAs[Long]("n") == 3)
    assert(math.abs(big.getAs[Double]("mean_lat") - 10.01) < 0.02)
    assert(math.abs(big.getAs[Double]("mean_lon") - 10.0) < 0.02)
  }
}
