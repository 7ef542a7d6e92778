package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Gade, Vec3}
import math.{toRadians => rad, toDegrees => deg}

class TracksSpec extends AnyFunSuite {

  test("not-a-knot cubic spline matches the independent numpy solve") {
    // golden: direct 4n-unknown per-segment linear system in numpy
    // (independent construction; scipy interp1d(kind='cubic') uses the
    // same not-a-knot boundary)
    val t = Array(0.0, 1.0, 2.5, 3.0, 5.0, 6.2)
    val y = Array(1.0, -0.5, 2.0, 1.5, 0.0, 3.3)
    val xs = Array(0.3, 0.9, 1.7, 2.6, 3.14159, 4.5, 6.0)
    val want = Array(-0.16796103843008994, -0.6048709730171706,
      0.8886469882801852, 1.9650512401199238, 1.2901477450986414,
      -0.15357567201553557, 2.3939620809484867)
    val m = Tracks.notAKnotSplineM(t, y)
    xs.indices.foreach { i =>
      assert(math.abs(Tracks.splineEval(t, y, m, xs(i)) - want(i)) < 1e-12,
        s"x=${xs(i)}")
    }
  }

  test("cubic spline reproduces cubic polynomials exactly (not-a-knot property)") {
    // a NATURAL spline would fail this — it forces zero curvature at
    // the ends; not-a-knot (scipy's choice) is exact on cubics
    val t = Array(0.0, 0.7, 1.1, 2.0, 3.3, 4.0, 5.5)
    def p(x: Double) = ((x - 2.0) * x + 3.0) * x - 1.0 + 0.5 * x * x * x
    val y = t.map(p)
    val m = Tracks.notAKnotSplineM(t, y)
    Seq(0.1, 0.95, 1.5, 2.71828, 3.9, 5.49).foreach { x =>
      assert(math.abs(Tracks.splineEval(t, y, m, x) - p(x)) < 1e-9, s"x=$x")
    }
  }

  test("interpVectors cubic on the reference doctest shape (numpy golden)") {
    // lat = rad(0..9), lon = sin(rad(linspace(-90, 70, 10))) — the
    // interp_nvectors doctest input (core.py:712); goldens from the
    // independent numpy spline + unit + n_E2lat_lon chain
    val lat = (0 until 10).map(i => math.toRadians(i.toDouble)).toArray
    val lon = (0 until 10).map(i =>
      math.sin(math.toRadians(-90.0 + 160.0 * i / 9.0))).toArray
    val nx = lat.indices.map(i => math.cos(lat(i)) * math.cos(lon(i))).toArray
    val ny = lat.indices.map(i => math.cos(lat(i)) * math.sin(lon(i))).toArray
    val nz = lat.map(math.sin)
    val t = (0 until 10).map(_.toDouble).toArray
    val tI = Array(0.45, 3.3, 7.77, 9.0)
    val itp = Tracks.interpVectors(tI, t, Array(nx, ny, nz), kind = "cubic")
    val wantLat = Array(0.4502490093003985, 3.3001937255849714,
      7.769997951221048, 9.000000000000002)
    val wantLon = Array(-56.76221714311895, -29.791669135205932,
      42.65575801638416, 53.84042121061987)
    tI.indices.foreach { i =>
      val u = graft.geo.VecMath.unit(
        graft.geo.Vec3(itp(0)(i), itp(1)(i), itp(2)(i)))
      val (la, lo) = graft.geo.Gade.nvecToLatLon(u)
      assert(math.abs(math.toDegrees(la) - wantLat(i)) < 1e-9, s"lat i=$i")
      assert(math.abs(math.toDegrees(lo) - wantLon(i)) < 1e-9, s"lon i=$i")
    }
  }

  test("B-spline interpolation orders 2/4/5 match the independent numpy solve") {
    // golden: dense collocation solve + recursive Cox-de Boor in
    // numpy (independent of the Scala banded/iterative path), scipy
    // make_interp_spline knot rules (midpoints for even k, not-a-knot
    // for odd k)
    val x = Array(0.0, 1.0, 2.5, 3.1, 4.0, 6.0, 7.2, 9.0, 10.5, 12.0)
    val y = x.map(v => math.sin(v) + 0.3 * v)
    val xi = Array(0.5, 2.0, 3.05, 5.0, 8.1, 11.7)
    val want = Map(
      2 -> Array(0.6715852684293625, 1.4769816861308604, 1.0059986538497516,
        0.6320768870375842, 3.3238948327112956, 2.7427587929636705),
      4 -> Array(0.6328034126471551, 1.5057134029059047, 1.0066162216907135,
        0.5514344392239581, 3.3697205550860034, 2.6359594715877153),
      5 -> Array(0.6184942951956088, 1.5107948797712851, 1.0064988087562607,
        0.5469544135064043, 3.3841810664200325, 2.707186106751356))
    for ((k, w) <- want) {
      val got = Tracks.bsplineInterpEval(x, y, k, xi)
      xi.indices.foreach(i => assert(math.abs(got(i) - w(i)) < 1e-10,
        s"k=$k x=${xi(i)}: got ${got(i)} want ${w(i)}"))
    }
  }

  test("order-k B-spline interpolation reproduces degree-k polynomials") {
    val x = Array(0.0, 0.6, 1.5, 2.0, 3.3, 4.1, 5.0, 6.6, 7.0, 8.5)
    for (k <- 2 to 5) {
      def p(v: Double) = (1 to k).foldLeft(1.0)((acc, _) => acc * (v - 1.7) / 2.0) + 0.25 * v
      val y = x.map(p)
      val xi = Array(0.3, 1.0, 2.9, 4.99, 6.9, 8.2)
      val got = Tracks.bsplineInterpEval(x, y, k, xi)
      xi.indices.foreach(i => assert(math.abs(got(i) - p(xi(i))) < 1e-9,
        s"k=$k x=${xi(i)}"))
    }
  }

  test("B-spline interpolation passes through random irregular data sites") {
    // interpolation property on random (seeded) sites, including
    // tightly clustered knots — catches banded-solver indexing bugs
    // the fixed goldens might miss
    val rnd = new scala.util.Random(20260816)
    for (k <- 2 to 5; trial <- 0 until 6) {
      val n = k + 1 + rnd.nextInt(20)
      val x = Iterator.iterate(0.0)(v => v + 1e-3 + rnd.nextDouble() * (if (rnd.nextInt(4) == 0) 0.01 else 2.0))
        .take(n).toArray
      val y = x.map(_ => rnd.nextDouble() * 10 - 5)
      val got = Tracks.bsplineInterpEval(x, y, k, x)
      x.indices.foreach(i => assert(math.abs(got(i) - y(i)) < 1e-7,
        s"k=$k trial=$trial i=$i: got ${got(i)} want ${y(i)}"))
    }
  }

  test("interpVectors kind routing: quadratic == order 2, cubic == order 3, NaN bounds") {
    val t = Array(0.0, 1.0, 2.5, 3.1, 4.0, 6.0)
    val rows = Array(t.map(v => math.cos(v)), t.map(v => v * 0.1))
    val ti = Array(-1.0, 0.5, 3.0, 6.0, 7.0)
    val q = Tracks.interpVectors(ti, t, rows, kind = "quadratic")
    val q2 = Tracks.interpVectors(ti, t, rows, kind = "2")
    val c = Tracks.interpVectors(ti, t, rows, kind = "cubic")
    val c2 = Tracks.interpVectors(ti, t, rows, kind = "3")
    for (r <- rows.indices; i <- ti.indices) {
      assert(q(r)(i).isNaN == q2(r)(i).isNaN &&
        (q(r)(i).isNaN || q(r)(i) == q2(r)(i)))
      assert(c(r)(i).isNaN == c2(r)(i).isNaN &&
        (c(r)(i).isNaN || math.abs(c(r)(i) - c2(r)(i)) < 1e-12))
    }
    assert(q(0)(0).isNaN && q(0)(4).isNaN) // out of span
    assert(!q(0)(3).isNaN) // right endpoint included
  }

  test("savgol padding modes mirror/constant/wrap match numpy np.pad goldens") {
    val sig = Array.tabulate(12)(i => math.sin(i * 0.7) + 0.05 * i)
    val want = Map(
      "mirror" -> Array(0.5138320552470266, 0.6311251234269315, 0.869562188790961,
        0.9399308462323663, 0.5065507432545124, -0.07100496426343267,
        -0.49758702124735815, -0.5490514394976657, -0.1776779176859668,
        0.4937305847436595, 1.106535062096142, 1.3512841321980882),
      "constant" -> Array(0.7569160276235134, 0.7067559042966385, 0.7928210161469317,
        0.9399308462323663, 0.5065507432545124, -0.07100496426343267,
        -0.49758702124735815, -0.5490514394976657, -0.1776779176859668,
        0.46106264176449663, 1.057138300420539, 1.4320034384118774),
      "wrap" -> Array(0.8172179989782593, 0.744876452115373, 0.789185946253884,
        0.9399308462323663, 0.5065507432545124, -0.07100496426343267,
        -0.49758702124735815, -0.5490514394976657, -0.1776779176859668,
        0.6039197846216393, 0.9195937587788541, 0.9278012289707417))
    val t = Array.tabulate(12)(_.toDouble)
    for ((mode, w) <- want) {
      // windowLength 7, polyorder 2, cval 1.5 (only 'constant' reads it);
      // query at the knots so the smoothed series itself comes back
      val got = Tracks.interpVectors(t, t, Array(sig), kind = "linear",
        windowLength = 7, polyorder = 2, mode = mode, cval = 1.5)(0)
      w.indices.foreach(i => assert(math.abs(got(i) - w(i)) < 1e-10,
        s"mode=$mode i=$i: got ${got(i)} want ${w(i)}"))
    }
  }

  test("interpolateSpline kind=quadratic interpolates tracks end-to-end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fixes = (0 until 40).map { i =>
      val t = i * 2.0
      val lat = rad(10.0 + 3.0 * math.sin(i * 0.2))
      val lon = rad(5.0 + 0.25 * i)
      (1L, t, Gade.latLonToNvec(lat, lon))
    }.map { case (id, t, n) => (id, t, n.x, n.y, n.z) }
      .toDF("track", "t", "nx", "ny", "nz")
      .withColumn("n", geo.vec(col("nx"), col("ny"), col("nz")))
    val qs = Seq((1L, 11.3), (1L, 40.7), (1L, 200.0)).toDF("track", "t")
    val out = Tracks.interpolateSpline(fixes, qs, "track", "t", "n",
      kind = "quadratic")
      .select("t", "n.x", "n.y", "n.z").collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(200.0)._1.isNaN) // out of span
    for (t0 <- Seq(11.3, 40.7)) {
      val (x, y, z) = out(t0)
      assert(math.abs(math.sqrt(x * x + y * y + z * z) - 1.0) < 1e-12)
      // within the fix envelope: lat in [7,13] deg
      assert(deg(math.asin(z)) > 6.9 && deg(math.asin(z)) < 13.1)
    }
  }

  test("interp kinds nearest/zero/slinear (scipy interp1d conventions)") {
    val t = Array(0.0, 1.0, 3.0, 4.0)
    val y = Array(10.0, 20.0, 30.0, 40.0)
    val tI = Array(0.4, 0.5, 0.6, 2.0, 3.0, 4.0, 5.0)
    val near = Tracks.interpVectors(tI, t, Array(y), kind = "nearest")(0)
    // exact midpoint 0.5 rounds down (searchsorted convention)
    assert(near.take(6).sameElements(Array(10.0, 10.0, 20.0, 20.0, 30.0, 40.0)))
    assert(near(6).isNaN)
    val zero = Tracks.interpVectors(tI, t, Array(y), kind = "zero")(0)
    assert(zero.take(6).sameElements(Array(10.0, 10.0, 10.0, 20.0, 30.0, 40.0)))
    val slin = Tracks.interpVectors(tI, t, Array(y), kind = "slinear")(0)
    assert(math.abs(slin(3) - 25.0) < 1e-12) // halfway 1->3
  }

  test("step kinds previous/next/nearest-up follow interp1d conventions") {
    val t = Array(0.0, 1.0, 3.0, 4.0)
    val y = Array(10.0, 20.0, 30.0, 40.0)
    val ti = Array(-0.5, 0.0, 0.5, 1.0, 2.0, 3.5, 4.0, 4.5)
    def run(kind: String) = Tracks.interpVectors(ti, t, Array(y), kind)(0)
    val prev = run("previous")
    val nxt = run("next")
    val nup = run("nearest-up")
    val near = run("nearest")
    assert(prev(0).isNaN && nxt(0).isNaN && prev(7).isNaN && nxt(7).isNaN)
    assert(prev.slice(1, 7).sameElements(Array(10.0, 10.0, 20.0, 20.0, 30.0, 40.0)))
    assert(nxt.slice(1, 7).sameElements(Array(10.0, 20.0, 20.0, 30.0, 40.0, 40.0)))
    // exact midpoints: 'nearest' rounds down, 'nearest-up' rounds up
    assert(near(2) == 10.0 && nup(2) == 20.0) // 0.5 is the 0-1 midpoint
    assert(near(4) == 20.0 && nup(4) == 30.0) // 2.0 is the 1-3 midpoint
    assert(near(5) == 30.0 && nup(5) == 40.0) // 3.5 is the 3-4 midpoint
  }

  test("interpolateSpline tolerates duplicate fix timestamps") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fixes = (Seq((1L, 2.0, 11.0, 7.0)) ++ (0 until 8).map { i =>
      (1L, i.toDouble, 10.0 + i, 5.0 + 2.0 * i) // includes a second t=2.0
    }).toDF("track", "t", "latd", "lond")
      .withColumn("n", geo.nvecDeg(col("latd"), col("lond")))
      .select("track", "t", "n")
    val queries = Seq((1L, 3.5)).toDF("track", "t")
    val out = Tracks.interpolateSpline(fixes, queries, "track", "t", "n")
      .select(geo.latDeg(col("n"))).collect()
    assert(out.length == 1 && !out(0).getDouble(0).isNaN,
      "duplicate knot must not NaN-poison the track")
    // the deduped track kinks at the duplicate, so allow a wide band —
    // the point of the test is a finite, plausible value
    assert(math.abs(out(0).getDouble(0) - 13.5) < 0.5)
  }

  test("windowed savgol equals the buffered variant on long tracks") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fixes = (0 until 3).flatMap { tr =>
      (0 until 60).map { i =>
        val lat = rad(5.0 + tr * 10 + 0.3 * i + 0.05 * math.sin(i * 1.7))
        val lon = rad(2.0 * tr + 0.2 * i + 0.04 * math.cos(i * 2.3))
        (tr.toLong, i.toDouble, lat, lon)
      }
    }.toDF("track", "t", "lat", "lon")
      .withColumn("n", geo.nvec(col("lat"), col("lon")))
      .select("track", "t", "n")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("track"), col("t"), col("n.x"), col("n.y"), col("n.z"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val buffered = key(Tracks.savgolSmooth(fixes, "track", "t", "n", 7, 2))
    val windowed = key(Tracks.savgolSmoothWindowed(fixes, "track", "t", "n", 7, 2))
    assert(buffered.keySet == windowed.keySet)
    buffered.foreach { case (k, (bx, by, bz)) =>
      val (wx, wy, wz) = windowed(k)
      assert(math.abs(bx - wx) < 1e-12 && math.abs(by - wy) < 1e-12 &&
        math.abs(bz - wz) < 1e-12, s"mismatch at $k")
    }
  }

  test("interpolateSpline carries depth z and NaNs outside the span") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fixes = (0 until 8).map { i =>
      val lat = math.toRadians(10.0 + i); val lon = math.toRadians(5.0 + 2 * i)
      (1L, i.toDouble, lat, lon, 100.0 + 10.0 * i * i) // quadratic depth
    }.toDF("track", "t", "lat", "lon", "depth")
      .withColumn("n", geo.nvec(col("lat"), col("lon")))
      .select("track", "t", "n", "depth")
    val queries = Seq((1L, 2.5), (1L, 6.25), (1L, -1.0), (1L, 9.5))
      .toDF("track", "t")
    val out = Tracks.interpolateSpline(fixes, queries, "track", "t", "n",
        zCol = Some("depth"), kind = "cubic")
      .select("t", "n.x", "depth").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(out.length == 4)
    // out-of-span -> NaN
    assert(out.head._2.isNaN && out.head._3.isNaN)
    assert(out.last._2.isNaN && out.last._3.isNaN)
    // depth is quadratic in t: the cubic spline reproduces it exactly
    assert(math.abs(out(1)._3 - (100.0 + 10.0 * 2.5 * 2.5)) < 1e-9)
    assert(math.abs(out(2)._3 - (100.0 + 10.0 * 6.25 * 6.25)) < 1e-9)
    // interpolated normals are unit
    assert(math.abs(out(1)._2) <= 1.0)
  }
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def trackDf(points: Seq[(Long, Double, Double, Double)]) =
    points.toDF("track", "t", "latd", "lond")
      .withColumn("n", geo.nvecDeg(col("latd"), col("lond")))
      .drop("latd", "lond")

  test("linear interpolation matches Gade Ex6") {
    val fixes = trackDf(Seq((1L, 10.0, 89.0, 0.0), (1L, 20.0, 89.0, 180.0)))
    val queries = Seq((1L, 16.0)).toDF("track", "t")
    val out = Tracks.interpolateLinear(fixes, queries, "track", "t", "n")
    val r = out.select(geo.latDeg(col("n")), geo.lonDeg(col("n"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 89.7999805) < 1e-7)
    assert(math.abs(math.abs(r.getDouble(1)) - 180.0) < 1e-7)
  }

  test("interpolation brackets correctly along a multi-fix track") {
    val fixes = trackDf((0 to 10).map(i => (7L, i * 10.0, 50.0 + i, 6.0)))
    val queries = Seq((7L, 25.0), (7L, 0.0), (7L, 100.0), (7L, 777.0)).toDF("track", "t")
    val rows = Tracks.interpolateLinear(fixes, queries, "track", "t", "n")
      .select(col("t"), geo.latDeg(col("n")).as("lat"))
      .collect().map(r => r.getDouble(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(math.abs(rows(25.0) - 52.5) < 1e-2)
    assert(math.abs(rows(0.0) - 50.0) < 1e-9)
    assert(math.abs(rows(100.0) - 60.0) < 1e-9)
    assert(rows(777.0).isNaN) // outside span -> null
  }

  test("savgol filter reproduces polynomials exactly") {
    // a quadratic track signal must be invariant under SG(polyorder=2)
    val c = Tracks.savgolCoefficients(7, 2)
    assert(math.abs(c.sum - 1.0) < 1e-12)
    def poly(x: Double) = 3.0 + 0.5 * x - 0.02 * x * x
    val smoothedCenter = (0 until 7).map(k => c(k) * poly(k - 3.0)).sum
    assert(math.abs(smoothedCenter - poly(0.0)) < 1e-10)
  }

  test("savgol smoothing denoises a track") {
    def noisy(i: Int): Double = 10.0 + i * 0.1 + (if (i % 2 == 0) 0.01 else -0.01)
    val fixes = trackDf((0 until 40).map(i => (3L, i.toDouble, noisy(i), 5.0)))
    val out = Tracks.savgolSmooth(fixes, "track", "t", "n", 9, 2)
      .withColumn("lat", geo.latDeg(col("n")))
      .orderBy("t").collect()
    // interior points should be close to the clean trend
    (10 until 30).foreach { i =>
      val clean = 10.0 + i * 0.1
      assert(math.abs(out(i).getAs[Double]("lat") - clean) < 2e-3,
        s"at $i: ${out(i).getAs[Double]("lat")} vs $clean")
    }
  }

  test("savgol interp mode reproduces polynomials exactly at the edges") {
    // a quadratic latitude trend must be exactly reproduced everywhere
    // under mode="interp" (nearest-mode edges are biased)
    def quad(i: Int): Double = 20.0 + 0.3 * i - 0.004 * i * i
    val fixes = trackDf((0 until 25).map(i => (4L, i.toDouble, quad(i), 5.0)))
    val out = Tracks.savgolSmooth(fixes, "track", "t", "n", 9, 2, mode = "interp")
      .withColumn("lat", geo.latDeg(col("n")))
      .orderBy("t").collect()
    (0 until 25).foreach { i =>
      assert(math.abs(out(i).getAs[Double]("lat") - quad(i)) < 2e-5,
        s"interp edge at $i: ${out(i).getAs[Double]("lat")} vs ${quad(i)}")
    }
  }

  test("course over ground matches the scalar kernel") {
    val pts = Seq((0.0, 59.381509, 10.496590), (1.0, 59.387647, 10.494713),
      (2.0, 59.390000, 10.490000), (3.0, 59.395000, 10.480000))
    val fixes = trackDf(pts.map { case (t, la, lo) => (9L, t, la, lo) })
    val got = Tracks.courseOverGround(fixes, "track", "t", "n")
      .orderBy("t").select("cog").collect().map(_.getDouble(0))
    val expected = Gade.courseOverGround(
      pts.map { case (_, la, lo) => Gade.latLonToNvec(rad(la), rad(lo)) }.toIndexedSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
    // single-point track -> NaN
    val lone = Tracks.courseOverGround(trackDf(Seq((5L, 0.0, 10.0, 10.0))),
      "track", "t", "n").select("cog").collect()(0).getDouble(0)
    assert(lone.isNaN)
  }
}
