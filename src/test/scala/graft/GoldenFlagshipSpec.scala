package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Frozen flagship output (FIXTURES.md §5): the AOI assignment, kNN
  * ranking and supplier ids must match the committed golden snapshot
  * exactly; distances numerically (aggregation order may wobble the
  * last ulp of the mean positions).
  */
class GoldenFlagshipSpec extends AnyFunSuite {
  test("flagship matches the committed golden snapshot") {
    val spark = SparkTestSession.spark
    val got = SparkEntry.entry(spark).collect()
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/flagship.csv"))
    val lines = try src.getLines().toVector finally src.close()
    val header = lines.head.split(",")
    val want = lines.tail.map(_.split(",").toVector)
    assert(got.length == want.length)
    val gotSorted = got.sortBy(r => (r.getString(0), r.getInt(r.fieldIndex("rank"))))
    gotSorted.zip(want).foreach { case (g, w) =>
      header.zipWithIndex.foreach { case (colName, i) =>
        val gv = String.valueOf(g.get(g.fieldIndex(colName)))
        colName match {
          case "aoi_id" | "s_suppkey" | "rank" | "n_points" =>
            assert(gv == w(i), s"$colName: got $gv want ${w(i)}")
          case _ =>
            val d = math.abs(gv.toDouble - w(i).toDouble)
            assert(d <= 1e-6 * math.max(1.0, math.abs(w(i).toDouble)),
              s"$colName: got $gv want ${w(i)}")
        }
      }
    }
  }
}
