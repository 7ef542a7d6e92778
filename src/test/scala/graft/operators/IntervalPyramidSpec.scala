package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd
import graft.index.{CellIndex, cells}
import graft.functions.geo

/** Interval overlap join vs brute-force, and pyramid rollup vs
  * direct per-level aggregation.
  */
class IntervalPyramidSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def mkIntervals(n: Int, seed: Int, span: Double) =
    (0 until n).map { i =>
      val s = rnd(seed * 1000L + i) * 10000.0
      (i.toLong, s, s + rnd(seed * 2000L + i) * span)
    }

  test("intervalJoin equals the brute inequality join (incl. boundary touch)") {
    val ls = mkIntervals(300, 3, 800.0) :+ ((900L, 100.0, 200.0))
    val rs = mkIntervals(250, 7, 50.0) :+ ((901L, 200.0, 300.0)) // touches 900 at a point
    val l = ls.toDF("l_id", "l_s", "l_e")
    val r = rs.toDF("r_id", "r_s", "r_e")
    for (w <- Seq(25.0, 400.0, 20000.0)) { // narrow / typical / single-bucket
      val got = IntervalJoin.intervalJoin(l, r, "l_s", "l_e", "r_s", "r_e", w)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      val want = for {
        (li, lsv, lev) <- ls; (ri, rsv, rev) <- rs
        if lsv <= rev && rsv <= lev
      } yield (li, ri)
      assert(got.length === got.distinct.length, s"duplicate pairs at width $w")
      assert(got.toSet === want.toSet, s"pair set mismatch at width $w")
    }
  }

  test("intervalJoin honors equi-keys and drops null/invalid intervals") {
    val l = Seq((1L, "a", Some(0.0), Some(10.0)), (2L, "b", Some(0.0), Some(10.0)),
      (3L, "a", None, Some(5.0)), (4L, "a", Some(8.0), Some(2.0)))
      .toDF("l_id", "l_k", "l_s", "l_e")
    val r = Seq((10L, "a", 5.0, 6.0), (11L, "b", 20.0, 30.0)).toDF("r_id", "r_k", "r_s", "r_e")
    val got = IntervalJoin.intervalJoin(l, r, "l_s", "l_e", "r_s", "r_e",
        bucketWidth = 4.0, keys = Seq(("l_k", "r_k")))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSet === Set((1L, 10L))) // key b doesn't overlap; 3 null; 4 invalid
  }

  test("intervalJoin fails loudly on runaway fan-out") {
    val l = Seq((1L, 0.0, 1e9)).toDF("l_id", "l_s", "l_e")
    val r = Seq((2L, 1.0, 2.0)).toDF("r_id", "r_s", "r_e")
    val e = intercept[Exception] {
      IntervalJoin.intervalJoin(l, r, "l_s", "l_e", "r_s", "r_e",
        bucketWidth = 1.0, maxBucketsPerRow = 1000).count()
    }
    assert(e.getMessage != null)
  }

  test("pyramid rollup equals direct per-level aggregation") {
    val pts = (0 until 4000).map { i =>
      val la = math.asin(2 * rnd(100L + i / 8) - 1)
      val lo = math.Pi * (2 * rnd(200L + i / 8) - 1)
      (i.toLong, la, lo, rnd(300L + i) * 10)
    }.toDF("id", "la", "lo", "w")
      .withColumn("n", geo.nvec(col("la"), col("lo")))
    val got = Pyramid.rollup(pts, "n", finest = 6, coarsest = 0, sumCols = Seq("w"))
      .select("level", "cell", "n", "w_sum")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).distinct.length === got.length)
    for (l <- 0 to 6) {
      val direct = pts.groupBy(cells.cellAt(col("n"), l).as("cell"))
        .agg(count(lit(1)).as("n"), sum("w").as("w_sum"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      val lvl = got.filter(_._1 == l).map(t => (t._2, t._3, t._4))
      assert(lvl.map(t => (t._1, t._2)).toSet ===
        direct.map(t => (t._1, t._2)), s"level $l cell counts")
      // sums re-aggregate associatively; compare at double tolerance
      val dm = direct.map(t => t._1 -> t._3).toMap
      lvl.foreach { case (c, _, s) =>
        assert(math.abs(s - dm(c)) <= 1e-9 * math.max(1.0, math.abs(dm(c))),
          s"level $l cell $c sum") }
    }
  }
}
