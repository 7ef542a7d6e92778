package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestSession
import graft.geo.{Gade, Karney, Vec3}
import math.{toRadians => rad}

/** The Column DSL must agree with the scalar kernels on a lat/lon grid,
  * evaluated through a real Spark plan (whole-stage codegen path).
  */
class GeoFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import geo._

  def grid(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pts = for {
      lat1 <- Seq(-80.0, -33.0, 0.0, 12.5, 47.0, 89.0)
      lon1 <- Seq(-179.0, -120.0, -5.0, 0.0, 30.0, 179.5)
    } yield (lat1, lon1, -lat1 / 2 + 3.0, lon1 / 3 - 11.0)
    pts.toDF("lat1", "lon1", "lat2", "lon2")
      .withColumn("n1", nvecDeg(col("lat1"), col("lon1")))
      .withColumn("n2", nvecDeg(col("lat2"), col("lon2")))
  }

  def check(rows: Array[Row], expected: Row => Double, actual: Row => Double,
            tol: Double, what: String): Unit =
    rows.foreach { r =>
      val e = expected(r); val a = actual(r)
      assert(math.abs(a - e) <= tol * math.max(1.0, math.abs(e)),
        s"$what: expected $e got $a for $r")
    }

  test("nvec round trip and distances match scalar kernels") {
    val df = grid()
      .withColumn("latBack", latDeg(col("n1")))
      .withColumn("lonBack", lonDeg(col("n1")))
      .withColumn("gc", gcDistance(col("n1"), col("n2")))
      .withColumn("chord", euclideanDistance(col("n1"), col("n2")))
      .withColumn("az", azimuth(col("n1"), col("n2")))
      .withColumn("geod", geodesicDistance(
        radians(col("lat1")), radians(col("lon1")),
        radians(col("lat2")), radians(col("lon2"))))
    val rows = df.collect()
    def nv(r: Row, f: String) = {
      val s = r.getStruct(r.fieldIndex(f)); Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2))
    }
    check(rows, r => r.getDouble(0), r => r.getDouble(r.fieldIndex("latBack")), 1e-12, "lat")
    check(rows, r => r.getDouble(1), r => r.getDouble(r.fieldIndex("lonBack")), 1e-12, "lon")
    check(rows, r => Gade.greatCircleDistance(nv(r, "n1"), nv(r, "n2")),
      r => r.getDouble(r.fieldIndex("gc")), 1e-9, "gcDist")
    check(rows, r => Gade.euclideanDistance(nv(r, "n1"), nv(r, "n2")),
      r => r.getDouble(r.fieldIndex("chord")), 1e-9, "chord")
    check(rows, r => Gade.azimuth(nv(r, "n1"), nv(r, "n2")),
      r => r.getDouble(r.fieldIndex("az")), 1e-9, "azimuth")
    check(rows,
      r => Karney.WGS84.inverse(rad(r.getDouble(0)), rad(r.getDouble(1)),
        rad(r.getDouble(2)), rad(r.getDouble(3)))._1,
      r => r.getDouble(r.fieldIndex("geod")), 1e-12, "geodesic")
  }

  test("pvec round trip through Catalyst") {
    val df = grid()
      .withColumn("p", toPvec(col("n1"), lit(120.0)))
      .withColumn("back", fromPvec(col("p")))
    val rows = df.select("n1", "p", "back.nvec", "back.depth").collect()
    rows.foreach { r =>
      val n1 = r.getStruct(0); val back = r.getStruct(2)
      for (i <- 0 to 2)
        assert(math.abs(n1.getDouble(i) - back.getDouble(i)) < 1e-12)
      assert(math.abs(r.getDouble(3) - 120.0) < 1e-6)
    }
  }

  test("path operators match scalar kernels") {
    val df = grid()
      .withColumn("ctd", crossTrackDistance(col("n1"), col("n2"),
        nvecDeg(col("lat1") + 1.0, col("lon1") + 1.0)))
      .withColumn("mid", interpolate(col("n1"), col("n2"), lit(0.5)))
      .withColumn("reck", sphereReckon(col("n1"), lit(5000.0 / 6371009.0), lit(1.0)))
    val rows = df.collect()
    def nv(r: Row, f: String) = {
      val s = r.getStruct(r.fieldIndex(f)); Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2))
    }
    rows.foreach { r =>
      val b = Gade.latLonToNvec(rad(r.getDouble(0) + 1.0), rad(r.getDouble(1) + 1.0))
      val expCtd = Gade.crossTrackDistance(nv(r, "n1"), nv(r, "n2"), b)
      assert(math.abs(r.getDouble(r.fieldIndex("ctd")) - expCtd) < 1e-6)
      val expMid = Gade.interpolate(nv(r, "n1"), nv(r, "n2"), 0.5)
      val gotMid = nv(r, "mid")
      assert(math.abs(gotMid.x - expMid.x) < 1e-12 && math.abs(gotMid.z - expMid.z) < 1e-12)
      val expReck = Gade.sphereReckon(nv(r, "n1"), 5000.0 / 6371009.0, 1.0)
      val gotReck = nv(r, "reck")
      assert(math.abs(gotReck.x - expReck.x) < 1e-12 && math.abs(gotReck.z - expReck.z) < 1e-12)
    }
  }

  test("geodesic inverse/reckon struct round trip") {
    val df = grid()
      .withColumn("inv", geodesicInverse(radians(col("lat1")), radians(col("lon1")),
        radians(col("lat2")), radians(col("lon2"))))
      .withColumn("fwd", geodesicReckon(radians(col("lat1")), radians(col("lon1")),
        col("inv.s12"), col("inv.az1")))
    val rows = df.select("lat2", "lon2", "fwd.lat2", "fwd.lon2").collect()
    rows.foreach { r =>
      assert(math.abs(math.toDegrees(r.getDouble(2)) - r.getDouble(0)) < 1e-9)
      val dLon = math.abs(math.toDegrees(r.getDouble(3)) - r.getDouble(1)) % 360
      assert(math.min(dLon, 360 - dLon) < 1e-9, s"lon mismatch: $r")
    }
  }

  test("mean position aggregate") {
    val df = grid().agg(meanPosition(col("n1")).as("m"))
    val m = df.collect()(0).getStruct(0)
    val exp = Gade.meanHorizontalPosition(
      grid().select("n1").collect().map { r =>
        val s = r.getStruct(0); Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2))
      })
    assert(math.abs(m.getDouble(0) - exp.x) < 1e-12)
    assert(math.abs(m.getDouble(1) - exp.y) < 1e-12)
    assert(math.abs(m.getDouble(2) - exp.z) < 1e-12)
  }

  test("plan stays in whole-stage codegen") {
    // non-foldable source: range -> derived coordinates
    val df = spark.range(1000)
      .withColumn("lat1", (col("id") % 170 - 85).cast("double"))
      .withColumn("lon1", (col("id") % 360 - 180).cast("double"))
      .select(gcDistance(nvecDeg(col("lat1"), col("lon1")),
        nvecDeg(col("lat1") / 2, col("lon1") / 2)).as("d"),
        geodesicDistance(radians(col("lat1")), radians(col("lon1")),
          lit(0.1), lit(0.2)).as("g"))
    // "*(1)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen in:\n$plan")
    assert(plan.contains("static_invoke"), s"karney not static-invoked:\n$plan")
    assert(df.agg(sum("d"), sum("g")).collect()(0).getDouble(0) > 0)
  }
}
