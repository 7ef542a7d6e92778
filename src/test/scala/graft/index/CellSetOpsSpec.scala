package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.SparkTestSession.rnd

/** compact/uncompact over cell covers: round trip, idempotence,
  * full-subtree collapse, and the no-complete-sibling-group
  * postcondition.
  */
class CellSetOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def cellSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("cell").collect().map(_.getLong(0)).toSet

  // clustered points so complete sibling groups actually occur
  def randomCells(n: Int, level: Int, seed: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val cla = math.toDegrees(math.asin(2 * rnd(seed * 31L + i / 20) - 1))
      val clo = 360 * rnd(seed * 37L + i / 20) - 180
      (cla + rnd(seed * 41L + i) * 4 - 2, clo + rnd(seed * 43L + i) * 4 - 2)
    }.toDF("la", "lo")
      .select(cells.cellAt(geo.nvecDeg(col("la"), col("lo")), level).as("cell"))
      .distinct()
  }

  test("uncompact(compact(S), L) == S for a uniform-level cover") {
    val s6 = randomCells(3000, 6, seed = 5)
    val compacted = CellSetOps.compact(s6, "cell")
    val back = CellSetOps.uncompact(compacted, "cell", 6)
    assert(cellSet(back) === cellSet(s6))
    // and compaction genuinely merged something at this density
    assert(compacted.count() < s6.count())
  }

  test("compact is idempotent and leaves no complete sibling group") {
    val c = CellSetOps.compact(randomCells(3000, 6, seed = 7), "cell")
    assert(cellSet(CellSetOps.compact(c, "cell")) === cellSet(c))
    val remaining = c
      .withColumn("lvl", cells.cellLevel(col("cell")))
      .filter(col("lvl") > 0)
      .withColumn("p", cells.parentCell(col("cell")))
      .groupBy("lvl", "p").count().filter(col("count") === 4).count()
    assert(remaining === 0L)
  }

  test("a full subtree collapses to its root") {
    import spark.implicits._
    val root = CellIndex.cellAt(0.3, 0.5, math.sqrt(1 - 0.09 - 0.25), 2)
    val fine = CellSetOps.uncompact(Seq(root).toDF("cell"), "cell", 6)
    assert(fine.count() === 256)
    assert(cellSet(CellSetOps.compact(fine, "cell")) === Set(root))
    // descendantCells passes through cells at/deeper than the target
    val same = CellSetOps.uncompact(Seq(root).toDF("cell"), "cell", 2)
    assert(cellSet(same) === Set(root))
  }

  test("deep cover crosses chunk rounds: exact-floor collapses forward") {
    import spark.implicits._
    // maxLvl = 10 ⇒ two rounds (floors 2, 0). The full level-2
    // subtree collapses to EXACTLY floor 2 in round 1, so the merge
    // completes only because the round forwards floor-level cells
    // instead of finalizing them.
    val root = CellIndex.cellAt(0.6, -0.3, math.sqrt(1 - 0.36 - 0.09), 2)
    val fine = CellSetOps.uncompact(Seq(root).toDF("cell"), "cell", 10)
    assert(fine.count() === (1L << 16))
    // plus a stray deep cell elsewhere that must survive untouched
    val stray = CellIndex.cellAt(-0.6, 0.3, -math.sqrt(1 - 0.36 - 0.09), 10)
    val got = cellSet(CellSetOps.compact(
      fine.unionByName(Seq(stray).toDF("cell")), "cell"))
    assert(got === Set(root, stray))
  }

  test("mixed-level input (a compact output plus extra fine cells) recompacts") {
    import spark.implicits._
    val root = CellIndex.cellAt(-0.4, 0.1, -math.sqrt(1 - 0.16 - 0.01), 3)
    val part = CellIndex.children(root) // 4 level-4 cells
    // drop one level-4 child, explode it to level 5 minus one cell:
    // nothing may merge back to root, but the 3 whole children stay
    val fineOfLast = CellIndex.children(part(3))
    val mixed = (part.take(3) ++ fineOfLast.take(3)).toSeq.toDF("cell")
    val got = cellSet(CellSetOps.compact(mixed, "cell"))
    assert(got === (part.take(3) ++ fineOfLast.take(3)).toSet)
    // completing the partial group merges all the way to the root
    val full = (part.take(3) ++ fineOfLast).toSeq.toDF("cell")
    assert(cellSet(CellSetOps.compact(full, "cell")) === Set(root))
  }
}
