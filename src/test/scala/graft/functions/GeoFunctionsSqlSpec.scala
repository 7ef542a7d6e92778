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
}
