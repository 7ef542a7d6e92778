package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd

class WebMercatorSpec extends AnyFunSuite {

  /** Independent scalar reference: the OSM formula evaluated directly
    * at the requested zoom (no shift derivation). */
  private def refTile(latRad: Double, lonRad: Double, z: Int): (Long, Long) = {
    val n = 1L << z
    val fx = lonRad / (2 * math.Pi) + 0.5
    val fy = 0.5 - math.log(math.tan(math.Pi / 4 + latRad / 2)) / (2 * math.Pi)
    def clamp(v: Double) = math.min(n - 1, math.max(0L, math.floor(v * n).toLong))
    (clamp(fx), clamp(fy))
  }

  private def refQuadkey(tx: Long, ty: Long, z: Int): String =
    (1 to z).map { i =>
      val s = z - i
      (((tx >> s) & 1) + ((ty >> s) & 1) * 2).toString
    }.mkString

  test("Bing documented example: tile (3,5) level 3 has quadkey 213") {
    assert(refQuadkey(3, 5, 3) == "213")
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = Seq((3L, 5L)).toDF("tx", "ty")
      .select(WebMercator.quadkey(col("tx"), col("ty"), 3).as("qk"))
      .head.getString(0)
    assert(got == "213")
  }

  test("tileX/tileY match the direct scalar reference on random points") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pts = (1L to 400L).map { i =>
      (i, math.asin(2 * rnd(i * 2) - 1), math.Pi * (2 * rnd(i * 2 + 1) - 1))
    }
    val df = pts.toDF("k", "lat", "lon")
    for (z <- Seq(0, 1, 5, 12, WebMercator.MaxZoom)) {
      val got = df.select(col("k"), WebMercator.tileX(col("lon"), z).as("tx"),
          WebMercator.tileY(col("lat"), z).as("ty"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      pts.foreach { case (k, lat, lon) =>
        assert(got(k) == refTile(lat, lon, z), s"k=$k z=$z")
      }
    }
  }

  test("polar latitudes clamp to the edge tile rows") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, math.toRadians(89.9), 0.0), (2L, math.toRadians(-89.9), 0.0),
      (3L, math.Pi / 2, 0.0), (4L, -math.Pi / 2, 0.0)).toDF("k", "lat", "lon")
    val rows = df.select(col("k"), WebMercator.tileY(col("lat"), 6).as("ty"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 0L && rows(3L) == 0L)
    assert(rows(2L) == 63L && rows(4L) == 63L)
  }

  test("assign: shift/substring derivation equals direct projection at every zoom") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pts = (1L to 300L).map { i =>
      (i, math.asin(2 * rnd(i * 7 + 1) - 1), math.Pi * (2 * rnd(i * 7 + 2) - 1))
    }
    val out = WebMercator.assign(pts.toDF("k", "lat", "lon"), "lat", "lon",
        finest = 11, coarsest = 0)
      .select("k", "zoom", "tx", "ty", "qk").collect()
    assert(out.length == 300 * 12)
    out.foreach { r =>
      val (k, z) = (r.getLong(0), r.getInt(1))
      val (lat, lon) = (pts(k.toInt - 1)._2, pts(k.toInt - 1)._3)
      val (tx, ty) = refTile(lat, lon, z)
      assert(r.getLong(2) == tx && r.getLong(3) == ty, s"k=$k z=$z")
      assert(r.getString(4) == refQuadkey(tx, ty, z), s"qk k=$k z=$z")
    }
    // quadkey prefix property: zoom-z key is a prefix of the zoom-11 key
    val byK = out.groupBy(_.getLong(0))
    byK.values.foreach { rs =>
      val fin = rs.maxBy(_.getInt(1)).getString(4)
      rs.foreach(r => assert(fin.startsWith(r.getString(4))))
    }
  }

  test("rollup equals direct per-zoom aggregation at every zoom") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = (1L to 500L).map { i =>
      (math.asin(2 * rnd(i * 3 + 1) - 1), math.Pi * (2 * rnd(i * 3 + 2) - 1),
        rnd(i * 3 + 3))
    }.toDF("lat", "lon", "v")
    val got = graft.operators.Pyramid.tileRollup(df, "lat", "lon",
        finest = 9, coarsest = 3, sumCols = Seq("v"))
      .collect()
      .map(r => (r.getInt(r.fieldIndex("zoom")), r.getLong(r.fieldIndex("tx")),
        r.getLong(r.fieldIndex("ty"))) ->
        (r.getLong(r.fieldIndex("n")), r.getDouble(r.fieldIndex("v_sum")))).toMap
    for (z <- 3 to 9) {
      val direct = df.groupBy(WebMercator.tileX(col("lon"), z).as("tx"),
          WebMercator.tileY(col("lat"), z).as("ty"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect()
        .map(r => (z, r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val atZ = got.filter(_._1._1 == z)
      assert(atZ.keySet == direct.keySet, s"zoom $z tiles")
      atZ.foreach { case (k, (n, sv)) =>
        assert(direct(k)._1 == n, s"$k n")
        assert(math.abs(direct(k)._2 - sv) <= 1e-9, s"$k sum")
      }
    }
  }

  test("null coordinates drop from assign and null-propagate through tileX/tileY") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, Some(0.4), Some(0.9)), (2L, None, Some(0.9)),
      (3L, Some(0.4), None)).toDF("k", "lat", "lon")
    // assign: rows with any null coordinate are dropped by contract —
    // they must NOT land on edge tiles (null lat once clamped to the
    // bottom row via the pole-coalesce; null lon to tile 0)
    val out = WebMercator.assign(df, "lat", "lon", finest = 4, coarsest = 4)
    assert(out.select("k").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // column forms: null in, null out (greatest/least skip nulls, so
    // an unguarded clamp would fabricate tile 0)
    val r = df.select(WebMercator.tileX(col("lon"), 4).as("tx"),
      WebMercator.tileY(col("lat"), 4).as("ty")).collect()
    assert(!r(0).isNullAt(0) && !r(0).isNullAt(1))
    assert(r(1).isNullAt(1), "null lat must not produce a tile row")
    assert(r(2).isNullAt(0), "null lon must not produce a tile column")
  }

  test("quadkey round-trips through quadkeyToXY; bounds contain their points") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val maxLat = math.atan(math.sinh(math.Pi))
    val pts = (1L to 300L).map { i =>
      (i, math.asin(2 * rnd(i * 17 + 3) - 1), math.Pi * (2 * rnd(i * 17 + 4) - 1))
    }
    val z = 9
    val df = pts.toDF("k", "lat", "lon")
      .withColumn("tx", WebMercator.tileX(col("lon"), z))
      .withColumn("ty", WebMercator.tileY(col("lat"), z))
      .withColumn("qk", WebMercator.quadkey(col("tx"), col("ty"), z))
      .withColumn("rt", WebMercator.quadkeyToXY(col("qk"), z))
      .withColumn("b", WebMercator.tileBounds(col("tx"), col("ty"), z))
    val rows = df.collect()
    rows.foreach { r =>
      // decode is the exact inverse of encode
      assert(r.getAs[Long]("tx") == r.getStruct(r.fieldIndex("rt")).getLong(0), r)
      assert(r.getAs[Long]("ty") == r.getStruct(r.fieldIndex("rt")).getLong(1), r)
      val (lat, lon) = (r.getAs[Double]("lat"), r.getAs[Double]("lon"))
      val b = r.getStruct(r.fieldIndex("b"))
      val (latN, latS, lonW, lonE) =
        (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
      assert(latN > latS && lonE > lonW, r)
      // non-clamped points sit inside their tile's mercator bounds
      if (math.abs(lat) < maxLat - 1e-9) {
        assert(lat <= latN + 1e-12 && lat >= latS - 1e-12, s"$lat not in [$latS, $latN]")
        assert(lon >= lonW - 1e-12 && lon <= lonE + 1e-12, s"$lon not in [$lonW, $lonE]")
      }
    }
    // null quadkey: null tx/ty FIELDS (structs are never null
    // themselves), including the zoom-0 constant branch
    val nq = Seq(Option.empty[String]).toDF("qk")
      .select(WebMercator.quadkeyToXY(col("qk"), 5).as("a"),
        WebMercator.quadkeyToXY(col("qk"), 0).as("b")).head
    assert(nq.getStruct(0).isNullAt(0) && nq.getStruct(0).isNullAt(1))
    assert(nq.getStruct(1).isNullAt(0) && nq.getStruct(1).isNullAt(1))
    // zoom 0: the world tile spans the full mercator frame
    val w = Seq((0L, 0L)).toDF("tx", "ty")
      .select(WebMercator.tileBounds(col("tx"), col("ty"), 0)).head.getStruct(0)
    assert(math.abs(w.getDouble(0) - maxLat) < 1e-12)
    assert(math.abs(w.getDouble(1) + maxLat) < 1e-12)
    assert(math.abs(w.getDouble(2) + math.Pi) < 1e-12)
    assert(math.abs(w.getDouble(3) - math.Pi) < 1e-12)
  }

  test("assign plan is map-only (no exchange) — the 100 TB contract") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val plan = WebMercator.assign(
        Seq((1L, 0.3, 0.4)).toDF("k", "lat", "lon"), "lat", "lon", 10, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("zoom 0 is the single world tile with empty quadkey") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val out = WebMercator.assign(Seq((1L, 0.7, -2.1)).toDF("k", "lat", "lon"),
      "lat", "lon", finest = 0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("tx")) == 0 && r.getLong(r.fieldIndex("ty")) == 0 &&
      r.getString(r.fieldIndex("qk")) == "")
  }
}
