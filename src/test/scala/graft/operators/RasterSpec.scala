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

  test("idw equals brute force; zero-sample queries null; exact hits clamped") {
    val samples = points.limit(400).select(col("id"), col("n").as("sn"), col("v"))
    // queries: 30 scattered points, one EXACTLY on a sample (id 7),
    // one in the south-pacific void beyond any sample's 1500 km
    val qBase = (0 until 30).map { i =>
      (1000L + i, -60.0 + i * 4.1, -170.0 + i * 11.3)
    } :+ ((2000L, -48.8, -123.4))
    val qdf = qBase.toDF("qid", "qlat", "qlon")
      .select(col("qid"), geo.nvecDeg(col("qlat"), col("qlon")).as("qn"))
      .union(points.filter(col("id") === 7)
        .select(lit(3000L).as("qid"), col("n").as("qn")))
    val radius = 1500e3
    val got = Raster.idw(qdf, "qn", samples, "sn", "v", radius,
        power = 2.0, minDistMeters = 1.0)
      .select("qid", "est", "n_samples")
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))))
      .toMap
    // brute reference
    val sRows = samples.select("sn", "v").collect().map { r =>
      val s = r.getStruct(0)
      (graft.geo.Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2)), r.getDouble(1))
    }
    val qRows = qdf.select("qid", "qn").collect().map { r =>
      val s = r.getStruct(1)
      (r.getLong(0), graft.geo.Vec3(s.getDouble(0), s.getDouble(1), s.getDouble(2)))
    }
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    qRows.foreach { case (qid, q) =>
      val inRange = sRows
        .map { case (s, v) => (graft.geo.Gade.greatCircleDistanceRad(q, s) * R, v) }
        .filter(_._1 <= radius)
      assert(got(qid)._2 == inRange.length, s"query $qid sample count")
      if (inRange.isEmpty) assert(got(qid)._1.isEmpty, s"query $qid must be null")
      else {
        val num = inRange.map { case (d, v) => v / math.pow(math.max(d, 1.0), 2) }.sum
        val den = inRange.map { case (d, _) => 1.0 / math.pow(math.max(d, 1.0), 2) }.sum
        assert(math.abs(got(qid)._1.get - num / den) < 1e-9,
          s"query $qid est ${got(qid)._1.get} vs ${num / den}")
      }
    }
    // the exact-hit query must be dominated by its coincident sample
    val hitVal = points.filter(col("id") === 7).select("v").collect()(0).getDouble(0)
    assert(math.abs(got(3000L)._1.get - hitVal) < 1e-3)
    // guaranteed zero-sample case: 10 m radius around a non-sample point
    val none = Raster.idw(qdf.filter(col("qid") === 2000L), "qn",
        samples, "sn", "v", 10.0).select("qid", "est", "n_samples").collect()(0)
    assert(none.isNullAt(1) && none.getLong(2) == 0L)
  }

  test("idw ignores null-value samples and keeps duplicate/null-payload queries intact") {
    // one real sample 100 km east, one NULL-value sample 1 km east:
    // the null sample must affect neither est nor n_samples
    val samples = Seq(
      (1L, 10.0, 1.0, Some(42.0)),
      (2L, 10.0, 0.01, None: Option[Double]))
      .toDF("sid", "slat", "slon", "v")
      .select(geo.nvecDeg(col("slat"), col("slon")).as("sn"), col("v"))
    val queries = Seq(
      (1L, Some("x")), (2L, None: Option[String]), (3L, Some("x")), (3L, Some("x")))
      .toDF("qid", "label")
      .withColumn("qn", geo.nvecDeg(lit(10.0), lit(0.0)))
    val out = Raster.idw(queries, "qn", samples, "sn", "v", 500e3)
      .select("qid", "label", "est", "n_samples").collect()
    assert(out.length == 4, "duplicate and null-payload query rows must all survive")
    out.foreach { r =>
      assert(r.getLong(3) == 1L, s"row $r: null-value sample leaked into n_samples")
      assert(math.abs(r.getDouble(2) - 42.0) < 1e-9,
        s"row $r: est biased by the null-value sample's weight")
    }
  }

  test("idw associates estimates correctly with a shuffle upstream of the queries") {
    // queries arrive through a repartition (nondeterministic partition
    // order): __qid must bind once, not per-branch — a distinct value
    // per query lets any mis-association show up as a wrong estimate
    val samples = (0 until 50).map(i => (10.0 + i * 0.5, 0.0, i * 1.0))
      .toDF("slat", "slon", "v")
      .select(geo.nvecDeg(col("slat"), col("slon")).as("sn"), col("v"))
    val queries = (0 until 50).map(i => (i.toLong, 10.0 + i * 0.5, 0.0))
      .toDF("qid", "qlat", "qlon")
      .repartition(8, col("qlat"))
      .select(col("qid"), geo.nvecDeg(col("qlat"), col("qlon")).as("qn"))
    val got = Raster.idw(queries, "qn", samples, "sn", "v", 1000.0)
      .select("qid", "est").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until 50).foreach { i =>
      assert(math.abs(got(i.toLong) - i.toDouble) < 1e-9,
        s"query $i got estimate ${got(i.toLong)} — __qid mis-association")
    }
    // and the caller-provided id path gives the same answer, no checkpoint
    val got2 = Raster.idw(queries, "qn", samples, "sn", "v", 1000.0,
        queryIdCol = Some("qid"))
      .select("qid", "est").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 === got)
  }

  test("kde density equals the all-pairs truncated-Gaussian brute force") {
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    // brute force: counts per cell, then every occupied pair within
    // the cutoff (no ring machinery at all)
    val pts = points.select("lat", "lon").collect()
      .map(r => graft.geo.Gade.latLonToNvec(
        math.toRadians(r.getDouble(0)), math.toRadians(r.getDouble(1))))
    def brute(level: Int, sigma: Double, cutoff: Double): Map[Long, (Long, Double)] = {
      val counts = pts.groupBy(p => CellIndex.cellAt(p.x, p.y, p.z, level))
        .map { case (c, ps) => c -> ps.length.toLong }
      val centers = counts.keys.map(c =>
        c -> graft.geo.VecMath.unit(CellIndex.centerXYZ(c))).toMap
      counts.keys.map { t =>
        val dens = counts.toSeq.flatMap { case (s, n) =>
          val d = graft.geo.Gade.greatCircleDistanceRad(centers(t), centers(s)) * R
          if (d <= cutoff) Some(n * math.exp(-d * d / (2 * sigma * sigma))) else None
        }.sum
        t -> (counts(t), dens)
      }.toMap
    }
    def check(level: Int, sigma: Double, cutoff: Double): Unit = {
      val got = Raster.kdeDensity(points, "n", level, sigma, cutoff)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = brute(level, sigma, cutoff)
      assert(got.keySet == want.keySet, s"level $level")
      want.foreach { case (cell, (n, dens)) =>
        assert(got(cell)._1 == n, s"level $level cell $cell count")
        assert(math.abs(got(cell)._2 - dens) <= 1e-9 * math.max(1.0, dens),
          s"level $level cell $cell density ${got(cell)._2} vs $dens")
      }
      // the own-cell contribution alone gives density >= n
      got.foreach { case (cell, (n, dens)) =>
        assert(dens >= n - 1e-9, s"level $level cell $cell density $dens < n $n")
      }
    }
    check(level = 5, sigma = 400e3, cutoff = 1000e3)
    // coarse level + planet-scale cutoff: the ring wraps the face and
    // enumerates every cell — the degradation path must ALSO be exact
    // all-pairs, not just non-empty
    check(level = 2, sigma = 400e3, cutoff = 12000e3)
    // an uncoverable cutoff (fine level, ring cannot wrap the face)
    // fails loudly instead of under-smoothing
    val e = intercept[IllegalArgumentException] {
      Raster.kdeDensity(points, "n", 10, 400e3, 12000e3)
    }
    assert(e.getMessage.contains("provably covers"))
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
