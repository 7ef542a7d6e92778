package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.SparkTestSession
import graft.functions.geo
import graft.index.{CellIndex, CellKernels}
import graft.SparkTestSession.rnd

class RasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val points = (0 until 2000).map { i =>
    val la = math.toDegrees(math.asin(2 * rnd(i * 2L) - 1))
    val lo = 360 * rnd(i * 2L + 1) - 180
    (i.toLong, la, lo, rnd(i * 5L))
  }.toDF("id", "lat", "lon", "v")
    .withColumn("n", geo.nvecDeg(col("lat"), col("lon")))

  test("rasterize conserves counts and downsample equals direct coarse raster") {
    val fine = Raster.rasterize(points, "n", 8,
      Seq(count(lit(1)).as("cnt"), sum("v").as("sv")))
    assert(fine.agg(sum("cnt")).collect()(0).getLong(0) == 2000)
    val down = Raster.downsample(fine, 4,
      Seq(sum("cnt").as("cnt"), sum("sv").as("sv")))
    val direct = Raster.rasterize(points, "n", 4,
      Seq(count(lit(1)).as("cnt"), sum("v").as("sv")))
    val a = down.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val b = direct.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (cell, (cnt, sv)) =>
      assert(b(cell)._1 == cnt)
      assert(math.abs(b(cell)._2 - sv) < 1e-9)
    }
  }

  test("vectorized cell polygons contain their centers and their points") {
    val raster = Raster.rasterize(points, "n", 6, Seq(count(lit(1)).as("cnt")))
    val vec = Raster.vectorize(raster)
    val rows = vec.select("cell", "ring_nvec_flat").collect()
    assert(rows.length == raster.count())
    rows.foreach { r =>
      val cell = r.getLong(0)
      val flat = r.getSeq[Double](1).toArray
      assert(flat.length == 12) // 4 corners x 3
      // the cell's own center must be inside its polygon (winding PIP)
      val c = graft.geo.VecMath.unit(CellIndex.centerXYZ(cell))
      assert(CellKernels.pointInPolygon(c.x, c.y, c.z, new GenericArrayData(flat)),
        s"center not inside polygon of cell $cell")
      // and a neighboring cell's center must NOT be
      val ring = CellIndex.ring(cell, 1).filter(_ != cell)
      val other = graft.geo.VecMath.unit(CellIndex.centerXYZ(ring.head))
      assert(!CellKernels.pointInPolygon(other.x, other.y, other.z, new GenericArrayData(flat)))
    }
    // round trip: every point is inside the polygon of its own cell
    val sample = points.limit(100)
      .withColumn("cell", graft.index.cells.cellAt(col("n"), 6))
      .select("cell", "n").collect()
    sample.foreach { r =>
      val flat = Raster.cellCornersFlat(r.getLong(0))
      val s = r.getStruct(1)
      assert(CellKernels.pointInPolygon(s.getDouble(0), s.getDouble(1), s.getDouble(2),
        new GenericArrayData(flat)))
    }
  }
}
