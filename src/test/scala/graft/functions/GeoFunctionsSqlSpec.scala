package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.geo.{Gade, Karney}
import math.{toRadians => rad}

class GeoFunctionsSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("GraftExtensions injects the same functions") {
    // a shared test JVM already holds a session, so getOrCreate would
    // ignore spark.sql.extensions; drive the extension object through
    // its registry hook directly (registerFunctions is what session
    // bootstrap calls) and then query through SQL
    val _ = spark // ensure an active session exists
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.applyExtensionFunctions(ext, spark)
    val v = spark.sql("SELECT geo_gc_distance(0.0, 0.0, 0.0, radians(90.0)) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(v - math.Pi / 2 * 6371009.0) < 1e-6)
  }

  test("registered SQL functions match kernels") {
    GeoFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  geo_gc_distance(radians(59.9139), radians(10.7522),
        |                  radians(40.7128), radians(-74.0060)) AS gc,
        |  geo_geodesic_distance(radians(59.9139), radians(10.7522),
        |                  radians(40.7128), radians(-74.0060)) AS geod,
        |  geo_azimuth(radians(0.0), radians(0.0), radians(10.0), radians(0.0)) AS az,
        |  geo_cell(radians(10.0), radians(20.0), 8) AS cell
        |""".stripMargin).collect()(0)
    val nA = Gade.latLonToNvec(rad(59.9139), rad(10.7522))
    val nB = Gade.latLonToNvec(rad(40.7128), rad(-74.0060))
    assert(math.abs(r.getDouble(0) - Gade.greatCircleDistance(nA, nB)) < 1e-6)
    assert(math.abs(r.getDouble(1) -
      Karney.WGS84.inverse(rad(59.9139), rad(10.7522), rad(40.7128), rad(-74.0060))._1) < 1e-6)
    assert(math.abs(r.getDouble(2)) < 1e-9) // due north
    val n = Gade.latLonToNvec(rad(10), rad(20))
    assert(r.getLong(3) == graft.index.CellIndex.cellAt(n.x, n.y, n.z, 8))
  }

  test("cell/dedup SQL functions match kernels") {
    GeoFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  geo_cell_parent(geo_cell(radians(10.0), radians(20.0), 8), 2) AS parent,
        |  geo_ring_cells(geo_cell(radians(10.0), radians(20.0), 6), 1) AS ring,
        |  geo_cap_cells(radians(45.0), radians(10.0), 3, 0.5) AS cap,
        |  geo_hamming(CAST(9223372036854775807 AS BIGINT), CAST(0 AS BIGINT)) AS hd,
        |  geo_minhash('the quick brown fox jumps over the lazy dog', 32) AS mh
        |""".stripMargin).collect()(0)
    val n = Gade.latLonToNvec(rad(10), rad(20))
    assert(r.getLong(0) ==
      graft.index.CellIndex.parent(graft.index.CellIndex.cellAt(n.x, n.y, n.z, 8), 2))
    assert(r.getSeq[Long](1).toArray.sameElements(
      graft.index.CellIndex.ring(graft.index.CellIndex.cellAt(n.x, n.y, n.z, 6), 1)))
    val c = Gade.latLonToNvec(rad(45), rad(10))
    assert(r.getSeq[Long](2).toArray.sameElements(
      graft.index.CellIndex.capCells(c.x, c.y, c.z, 3, 0.5)))
    assert(r.getInt(3) == 63)
    val mh = r.getSeq[Long](4)
    assert(mh.length == 32 && mh.distinct.length > 1)
  }

  test("addressing SQL functions (geohash / tiles / quadkeys) match kernels") {
    GeoFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val r = spark.sql(
      """SELECT
        |  geo_geohash(57.64911, 10.40744, 11) AS gh,
        |  geo_tile_x(10.40744, 12) AS tx,
        |  geo_tile_y(57.64911, 12) AS ty,
        |  geo_quadkey(geo_tile_x(10.40744, 12), geo_tile_y(57.64911, 12), 12) AS qk,
        |  geo_quadkey_xy(geo_quadkey(geo_tile_x(10.40744, 12),
        |    geo_tile_y(57.64911, 12), 12), 12) AS xy,
        |  geo_tile_bounds(geo_tile_x(10.40744, 12),
        |    geo_tile_y(57.64911, 12), 12) AS b
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "u4pruydqqvj") // geohash.org published vector
    val want = spark.range(1).select(
      graft.index.WebMercator.tileX(radians(lit(10.40744)), 12).as("tx"),
      graft.index.WebMercator.tileY(radians(lit(57.64911)), 12).as("ty"))
      .collect()(0)
    assert(r.getLong(1) == want.getLong(0) && r.getLong(2) == want.getLong(1))
    val xy = r.getStruct(4)
    assert(xy.getLong(0) == r.getLong(1) && xy.getLong(1) == r.getLong(2))
    val b = r.getStruct(5)
    assert(b.getDouble(3) > b.getDouble(2), "lon_e > lon_w")
    assert(math.toRadians(10.40744) >= b.getDouble(2) &&
      math.toRadians(10.40744) <= b.getDouble(3))

    val r2 = spark.sql(
      """SELECT
        |  geo_cell_children(geo_cell(radians(10.0), radians(20.0), 4), 6) AS kids,
        |  geo_cells_compact(geo_cell_children(geo_cell(radians(10.0), radians(20.0), 4), 6), 0) AS comp
        |""".stripMargin).collect()(0)
    assert(r2.getSeq[Long](0).length == 16)
    val n = Gade.latLonToNvec(rad(10), rad(20))
    assert(r2.getSeq[Long](1) == Seq(graft.index.CellIndex.cellAt(n.x, n.y, n.z, 4)),
      "16 complete grandchildren must compact back to the one ancestor")
  }

  test("polygon analysis SQL functions match kernels and the AoiM encoding") {
    GeoFunctions.register(spark)
    // flat single ring + ring-list encoding as SQL array literals
    def fl(d: Double) = "CAST(%.17g AS DOUBLE)".format(d)
    val ring = Seq((-10.0, -10.0), (-10.0, 10.0), (10.0, 10.0), (10.0, -10.0))
    val flatSql = "array(" + ring.flatMap { case (la, lo) =>
      val v = Gade.latLonToNvec(rad(la), rad(lo)); Seq(v.x, v.y, v.z)
    }.map(fl).mkString(", ") + ")"
    val m = SpatialJoinsAoiM(ring)
    val ringsSql = "array(" + m.map(fl).mkString(", ") + ")"
    val r = spark.sql(
      s"""SELECT
         |  geo_pip(0.0, 0.0, $flatSql) AS inz,
         |  geo_pip(30.0, 0.0, $flatSql) AS outz,
         |  geo_boundary_dist(0.0, 0.0, $flatSql) AS bd,
         |  geo_pip_rings(0.0, 0.0, $ringsSql) AS rin,
         |  geo_boundary_dist_rings(0.0, 0.0, $ringsSql) AS rbd,
         |  geo_polygon_area($flatSql) AS area
         |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(3))
    assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 1e-9,
      "single-ring list must equal the flat form")
    assert(r.getDouble(2) < 0, "inside => negative")
    // 20x20 deg box area within 3% of the flat-square estimate
    val approx = math.pow(math.toRadians(20.0) * 6371009.0, 2)
    assert(math.abs(r.getDouble(5) / approx - 1.0) < 0.03)
  }

  test("geo_polygon_perimeter and geo_segs_cross match the kernels") {
    GeoFunctions.register(spark)
    def fl(d: Double) = "CAST(%.17g AS DOUBLE)".format(d)
    val ring = Seq((-10.0, -10.0), (-10.0, 10.0), (10.0, 10.0), (10.0, -10.0))
    val flatSql = "array(" + ring.flatMap { case (la, lo) =>
      val v = Gade.latLonToNvec(rad(la), rad(lo)); Seq(v.x, v.y, v.z)
    }.map(fl).mkString(", ") + ")"
    val r = spark.sql(
      s"""SELECT
         |  geo_polygon_perimeter($flatSql) AS per,
         |  geo_segs_cross(-5.0, 0.0, 5.0, 0.0, 0.0, -5.0, 0.0, 5.0) AS cr,
         |  geo_segs_cross(0.0, 0.0, 0.0, 10.0, 5.0, 0.0, 5.0, 10.0) AS nocr
         |""".stripMargin).collect()(0)
    // kernel-path perimeter: the same edges summed driver-side
    val expected = ring.indices.map { i =>
      val a = Gade.latLonToNvec(rad(ring(i)._1), rad(ring(i)._2))
      val b = Gade.latLonToNvec(rad(ring((i + 1) % 4)._1), rad(ring((i + 1) % 4)._2))
      val c = a cross b
      math.atan2(c.norm, a dot b)
    }.sum * 6371009.0
    assert(math.abs(r.getDouble(0) - expected) / expected < 1e-12)
    assert(r.getBoolean(1) && !r.getBoolean(2))
  }

  private def SpatialJoinsAoiM(ring: Seq[(Double, Double)]): Array[Double] =
    graft.operators.SpatialJoins.AoiM("t", Seq(ring)).flatRings
}
