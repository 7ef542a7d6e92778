package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.Gade

/** Geofence enter/exit transitions and implied-speed outlier flags:
  * hand-built tracks with known crossings and step distances.
  */
class TrackCleaningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val fence = SpatialJoins.Aoi("box",
    Seq((-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)))

  test("geofence transitions: crossing sequence, start-inside enter, no trailing exit") {
    // track 1: out, in, in, out, in  -> enter@1, exit@3, enter@4 (ends
    // inside, no trailing exit); track 2 starts INSIDE -> enter@0 then
    // exit@1; track 3 never inside -> no events
    val pts = Seq(
      (1L, 0L, 5.0, 0.0), (1L, 1L, 0.2, 0.0), (1L, 2L, 0.5, 0.3),
      (1L, 3L, 3.0, 0.0), (1L, 4L, -0.5, 0.0),
      (2L, 0L, 0.0, 0.0), (2L, 1L, 0.0, 4.0),
      (3L, 0L, 30.0, 30.0), (3L, 1L, 31.0, 30.0))
      .toDF("tid", "t", "latd", "lond")
      .withColumn("nv", geo.nvecDeg(col("latd"), col("lond")))
    val got = SpatialJoins.geofenceTransitions(pts, "tid", "t", "nv", Seq(fence))
      .orderBy("tid", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((1L, 1L, "enter"), (1L, 3L, "exit"), (1L, 4L, "enter"),
      (2L, 0L, "enter"), (2L, 1L, "exit")))
  }

  test("geofence transitions: null time/position rows are dropped, multiple fences independent") {
    val fence2 = SpatialJoins.Aoi("far",
      Seq((29.0, 29.0), (29.0, 31.0), (32.0, 31.0), (32.0, 29.0)))
    val pts = Seq(
      (1L, Some(0L), Some(5.0)), (1L, None, Some(0.0)), (1L, Some(2L), None),
      (1L, Some(3L), Some(0.0)), (3L, Some(0L), Some(30.0)))
      .toDF("tid", "t", "latd")
      .withColumn("nv", when(col("latd").isNotNull,
        geo.nvecDeg(col("latd"), lit(0.0) + when(col("tid") === 3, 30.0).otherwise(0.0))))
    val got = SpatialJoins.geofenceTransitions(pts, "tid", "t", "nv",
        Seq(fence, fence2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // track 1: null-time inside point skipped -> enter lands on t=3;
    // track 3 sits in fence2 only
    assert(got.toSet == Set((1L, 3L, "box", "enter"), (3L, 0L, "far", "enter")))
  }

  test("geofence and speed plans carry exactly one hash shuffle (the window)") {
    val pts = Seq((1L, 0.0, 0.5, 0.5), (1L, 1.0, 0.6, 0.5))
      .toDF("tid", "t", "latd", "lond")
      .withColumn("nv", geo.nvecDeg(col("latd"), col("lond")))
    val gfPlan = SpatialJoins.geofenceTransitions(pts, "tid", "t", "nv", Seq(fence))
      .queryExecution.executedPlan.toString
    assert(gfPlan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, gfPlan)
    assert(!gfPlan.contains("CartesianProduct"), gfPlan)
    val spPlan = Tracks.speedFlags(pts, "tid", "t", "nv", 100.0)
      .queryExecution.executedPlan.toString
    assert(spPlan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, spPlan)
  }

  test("cell flows count consecutive distinct-cell transitions, dwell excluded") {
    // level-2 cells: (0,0) and (0,90) sit on different cube faces;
    // consecutive same-cell fixes are dwell. Track 1: A A B A ->
    // A->B, B->A. Track 2: all in A -> no flows. Null-time dropped.
    val pts = Seq(
      (1L, Some(0.0), 0.0, 0.0), (1L, Some(1.0), 0.2, 0.2),
      (1L, Some(2.0), 0.0, 90.0), (1L, Some(3.0), 0.0, 0.0),
      (1L, None, 0.0, 90.0),
      (2L, Some(0.0), 0.1, 0.1), (2L, Some(1.0), 0.3, 0.3))
      .toDF("tid", "t", "latd", "lond")
      .withColumn("nv", geo.nvecDeg(col("latd"), col("lond")))
    val a = graft.index.CellIndex.cellAt(
      Gade.latLonToNvec(0, 0).x, Gade.latLonToNvec(0, 0).y,
      Gade.latLonToNvec(0, 0).z, 2)
    val b = {
      val v = Gade.latLonToNvec(0, math.toRadians(90))
      graft.index.CellIndex.cellAt(v.x, v.y, v.z, 2)
    }
    assert(a != b)
    val got = Tracks.cellFlows(pts, "tid", "t", "nv", level = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((a, b) -> 1L, (b, a) -> 1L), got)
  }

  test("speed flags equal scalar reference; first fix null; duplicate timestamp flags") {
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    val pts = Seq(
      (1L, 0.0, 0.0, 0.0), (1L, 10.0, 0.0, 0.01), (1L, 20.0, 0.0, 0.5),
      (2L, 0.0, 45.0, 45.0), (2L, 5.0, 45.2, 45.0))
      .toDF("tid", "t", "latd", "lond")
      .withColumn("nv", geo.nvecDeg(col("latd"), col("lond")))
    val got = Tracks.speedFlags(pts, "tid", "t", "nv", maxSpeedMps = 1000.0)
      .select("tid", "t", "speed_mps", "too_fast")
      .collect().map(r => (r.getLong(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))).toMap
    def gc(a: (Double, Double), b: (Double, Double)) =
      Gade.greatCircleDistanceRad(
        Gade.latLonToNvec(math.toRadians(a._1), math.toRadians(a._2)),
        Gade.latLonToNvec(math.toRadians(b._1), math.toRadians(b._2))) * R
    // first fixes: null speed, unflagged
    assert(got((1L, 0.0)) == (None, false) && got((2L, 0.0)) == (None, false))
    val s11 = gc((0.0, 0.0), (0.0, 0.01)) / 10.0    // ~111 m/s: ok
    val s12 = gc((0.0, 0.01), (0.0, 0.5)) / 10.0    // ~5.4 km/s: flagged
    val s21 = gc((45.0, 45.0), (45.2, 45.0)) / 5.0  // ~4.4 km/s: flagged
    assert(math.abs(got((1L, 10.0))._1.get - s11) < 1e-9 && !got((1L, 10.0))._2)
    assert(math.abs(got((1L, 20.0))._1.get - s12) < 1e-9 && got((1L, 20.0))._2)
    assert(math.abs(got((2L, 5.0))._1.get - s21) < 1e-9 && got((2L, 5.0))._2)
    // duplicate timestamp with movement: infinite speed, loudly flagged
    val dup = Seq((1L, 0.0, 0.0, 0.0), (1L, 0.0, 0.0, 1.0))
      .toDF("tid", "t", "latd", "lond")
      .withColumn("nv", geo.nvecDeg(col("latd"), col("lond")))
    val d = Tracks.speedFlags(dup, "tid", "t", "nv", 1000.0)
      .filter(col("speed_mps").isNotNull).collect()
    assert(d.length == 1 && d.head.getAs[Double]("speed_mps").isPosInfinity
      && d.head.getAs[Boolean]("too_fast"))
  }
}
