package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd

class GeohashSpec extends AnyFunSuite {

  /** Independent scalar reference: the textbook bisection loop. */
  private def refGeohash(latDeg: Double, lonDeg: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder
    var even = true
    var bitsBuf = 0; var nbits = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lonDeg >= mid) { bitsBuf = bitsBuf * 2 + 1; lonLo = mid }
        else { bitsBuf = bitsBuf * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (latDeg >= mid) { bitsBuf = bitsBuf * 2 + 1; latLo = mid }
        else { bitsBuf = bitsBuf * 2; latHi = mid }
      }
      even = !even
      nbits += 1
      if (nbits == 5) { sb.append(Geohash.Alphabet(bitsBuf)); bitsBuf = 0; nbits = 0 }
    }
    sb.toString
  }

  private def encodeOne(latDeg: Double, lonDeg: Double, p: Int): String = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    Seq((latDeg, lonDeg)).toDF("lat", "lon")
      .select(Geohash.encode(radians(col("lat")), radians(col("lon")), p))
      .head.getString(0)
  }

  test("published test vectors") {
    // Wikipedia's worked example and the geohash.org demo hash
    assert(refGeohash(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(encodeOne(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(refGeohash(42.605, -5.603, 5) == "ezs42")
    assert(encodeOne(42.605, -5.603, 5) == "ezs42")
  }

  test("matches the bisection reference on random points at several precisions") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pts = (1L to 300L).map { i =>
      (i, math.toDegrees(math.asin(2 * rnd(i * 11 + 1) - 1)),
        360 * rnd(i * 11 + 2) - 180)
    }
    val df = pts.toDF("k", "lat", "lon")
    for (p <- Seq(1, 4, 7, 12)) {
      val got = df.select(col("k"),
          Geohash.encode(radians(col("lat")), radians(col("lon")), p).as("gh"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      pts.foreach { case (k, la, lo) =>
        assert(got(k) == refGeohash(la, lo, p), s"k=$k p=$p (${la}, ${lo})")
      }
    }
  }

  test("prefix property: precision p-1 hash is the p hash truncated") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = (1L to 200L).map { i =>
      (math.asin(2 * rnd(i * 13 + 5) - 1), math.Pi * (2 * rnd(i * 13 + 6) - 1))
    }.toDF("lat", "lon")
    val row = df.select(
      Geohash.encode(col("lat"), col("lon"), 10).as("g10"),
      Geohash.encode(col("lat"), col("lon"), 6).as("g6"),
      Geohash.encode(col("lat"), col("lon"), 1).as("g1")).collect()
    row.foreach { r =>
      assert(r.getString(0).startsWith(r.getString(1)))
      assert(r.getString(1).startsWith(r.getString(2)))
    }
  }

  test("encodeDeg matches the bisection loop ON exact dyadic-degree boundaries") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // boundary inputs 180*k/2^n (e.g. -84.375 at nlat=5) round BELOW
    // the boundary through the radian form; the degree form divides
    // by 180/360 exactly and must match the bisection loop bit-for-bit
    for (p <- Seq(2, 5, 8)) {
      val nlat = 5 * p / 2; val nlon = (5 * p + 1) / 2
      val pts = (1 to 40).map { i =>
        val kLat = (i * 7) % (1 << nlat)
        val kLon = (i * 11) % (1 << nlon)
        (-90.0 + 180.0 * kLat / (1 << nlat), -180.0 + 360.0 * kLon / (1 << nlon))
      } :+ (-84.375, 10.0)
      val got = pts.toDF("lat", "lon")
        .select(Geohash.encodeDeg(col("lat"), col("lon"), p).as("gh"))
        .collect().map(_.getString(0))
      pts.zip(got).foreach { case ((la, lo), gh) =>
        assert(gh == refGeohash(la, lo, p), s"p=$p boundary ($la, $lo)")
      }
    }
  }

  test("edges clamp and nulls propagate") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // lat exactly +90 / lon exactly +180 clamp to the top bucket
    // (the reference loop also puts >= mid in the upper half)
    assert(encodeOne(90.0, 180.0, 6) == refGeohash(90.0, 180.0, 6))
    assert(encodeOne(-90.0, -180.0, 6) == refGeohash(-90.0, -180.0, 6))
    val df = Seq((Some(0.3), Option.empty[Double]), (None, Some(0.2)))
      .toDF("lat", "lon")
    val out = df.select(Geohash.encode(col("lat"), col("lon"), 5)).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
