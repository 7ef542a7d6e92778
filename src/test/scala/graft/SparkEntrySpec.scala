package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flagship entry returns AOI/kNN rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 12, s"4 AOIs x top-3 expected, got ${rows.length}")
    val aois = rows.map(_.getAs[String]("aoi_id")).toSet
    assert(aois == Set("equator_box", "antimeridian", "north_cap", "south_band"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_points") > 0)
      assert(r.getAs[Double]("geodesic_m") > 0)
    }
  }

  test("every query runs at sf0.001 and yields rows (except dedup/setop)") {
    val mayBeEmpty = Set("q19_dedup_exact", "q05_brand_setop", "q04_empty_orders")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // name printed BEFORE the action: a plan that wedges the
      // optimizer (this has happened — Catalyst's NestedColumnAliasing
      // is quadratic over nested-struct extractions) must be
      // attributable from the log alone
      println(s"[entry-spec] $name"); Console.flush()
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(mayBeEmpty(name) || n > 0, s"$name returned no rows")
    }
  }

  test("oracle keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }
}
