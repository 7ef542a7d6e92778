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
