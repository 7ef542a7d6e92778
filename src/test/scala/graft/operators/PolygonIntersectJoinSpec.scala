package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.index.cells

/** Polygon-polygon intersection join: the exact predicate against
  * hand-labeled topology relations (every branch of ringsIntersect),
  * and the mixed-level cover alignment against an all-pairs run of
  * the same predicate (proving the candidate generator drops no
  * intersecting pair).
  */
class PolygonIntersectJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the production encoding, not a re-implementation — a header/layout
  // change must fail these specs, not silently diverge from them
  private def flatRings(rings: Seq[Seq[(Double, Double)]]): Seq[Double] =
    SpatialJoins.AoiM("spec", rings).flatRings.toSeq
  private def box(la1: Double, lo1: Double, la2: Double, lo2: Double) =
    Seq((la1, lo1), (la1, lo2), (la2, lo2), (la2, lo1))

  test("ringsIntersect decides every topology relation (hand-labeled)") {
    val outer = box(30.0, 60.0, 55.0, 90.0)
    val hole = box(38.0, 68.0, 48.0, 82.0)
    val island = box(41.0, 72.0, 45.0, 78.0)
    val multi = Seq(outer, hole, island)
    val cases: Seq[(String, Seq[Seq[(Double, Double)]], Seq[Seq[(Double, Double)]], Boolean)] = Seq(
      ("disjoint", Seq(box(-10, -10, 10, 10)), Seq(box(40, 100, 50, 120)), false),
      ("overlap via vertex-in", Seq(box(-10, -10, 10, 10)), Seq(box(0, 0, 20, 20)), true),
      ("containment a-in-b", Seq(box(1, 1, 2, 2)), Seq(box(-10, -10, 10, 10)), true),
      ("containment b-in-a", Seq(box(-10, -10, 10, 10)), Seq(box(1, 1, 2, 2)), true),
      // plus-sign: edges cross, NO vertex of either inside the other
      ("cross-only", Seq(box(-20, -2, 20, 2)), Seq(box(-2, -20, 2, 20)), true),
      // inside the hole (parity even) but clear of the island
      ("a-in-hole", Seq(box(38.5, 68.5, 40.0, 70.5)), multi, false),
      // overlapping the island (parity odd again)
      ("a-on-island", Seq(box(42.0, 74.0, 43.0, 75.0)), multi, true),
      // straddling the hole rim from inside the outer part
      ("a-across-hole-rim", Seq(box(36.0, 70.0, 39.0, 72.0)), multi, true),
      // coincident great circle: both regions meet the equator along
      // overlapping arcs (na x nb is the exact zero vector there)
      ("coincident-equator-edges", Seq(box(0.0, 0.0, 10.0, 10.0)),
        Seq(box(-10.0, 5.0, 0.0, 15.0)), true),
      ("coincident-equator-disjoint-arcs", Seq(box(0.0, 0.0, 10.0, 10.0)),
        Seq(box(-10.0, 20.0, 0.0, 30.0)), false))
    val rows = cases.map { case (name, a, b, want) =>
      (name, flatRings(a), flatRings(b), want) }
      .toDF("name", "a", "b", "want")
    val got = rows.withColumn("got", cells.ringsIntersect(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getBoolean(4), r.getBoolean(3)))
    val bad = got.filter { case (_, g, w) => g != w }
    assert(bad.isEmpty, s"wrong relations: ${bad.mkString("; ")}")
  }

  test("degenerate edges (repeated closing vertex) contribute no false crossings") {
    // GeoJSON-style rings repeat the first vertex as the last; the
    // implicit closing edge is then zero-length with a zero normal.
    // Before the degenerate-edge guard that normal made both bracket
    // tests vacuously true and the coincident-circle branch reported
    // a crossing against EVERY edge of the other ring.
    def closed(b: Seq[(Double, Double)]) = b :+ b.head
    val cases = Seq(
      ("closed-disjoint", Seq(closed(box(-10, -10, 10, 10))),
        Seq(box(40, 100, 50, 120)), false),
      ("closed-both-disjoint", Seq(closed(box(-10, -10, 10, 10))),
        Seq(closed(box(40, 100, 50, 120))), false),
      ("closed-overlap", Seq(closed(box(-10, -10, 10, 10))),
        Seq(box(0, 0, 20, 20)), true),
      // crossing THROUGH the duplicated vertex: carried by the
      // non-degenerate neighbor edges
      ("closed-cross-at-dup-vertex", Seq(closed(box(-10, -10, 10, 10))),
        Seq(box(-12, -12, -8, -8)), true))
    val rows = cases.map { case (name, a, b, want) =>
      (name, flatRings(a), flatRings(b), want) }
      .toDF("name", "a", "b", "want")
    val got = rows.withColumn("got", cells.ringsIntersect(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getBoolean(4), r.getBoolean(3)))
    val bad = got.filter { case (_, g, w) => g != w }
    assert(bad.isEmpty, s"wrong relations: ${bad.mkString("; ")}")
  }

  test("an empty side yields the empty result, not an exception") {
    val a = Seq(("a1", flatRings(Seq(box(-10, -10, 10, 10))))).toDF("a_id", "a_rings")
    val bEmpty = Seq.empty[(String, Seq[Double])].toDF("b_id", "b_rings")
    val bNull = Seq(("bn", null.asInstanceOf[Seq[Double]])).toDF("b_id", "b_rings")
    for (b <- Seq(bEmpty, bNull)) {
      val out = SpatialJoins.polygonIntersectJoin(a, "a_id", "a_rings", b, "b_id", "b_rings")
      assert(out.columns.toSeq == Seq("a_id", "b_id"))
      assert(out.count() == 0L)
      val swapped = SpatialJoins.polygonIntersectJoin(b, "b_id", "b_rings", a, "a_id", "a_rings")
      assert(swapped.columns.toSeq == Seq("b_id", "a_id"))
      assert(swapped.count() == 0L)
    }
  }

  test("polygonDissolve labels overlay components with the min reachable id") {
    // a1-a2-a3 chain (a1 and a3 do NOT touch directly — the label
    // must travel through a2), b isolated, null rings dropped
    val rows = Seq(
      ("a1", flatRings(Seq(box(0, 0, 10, 10)))),
      ("a2", flatRings(Seq(box(5, 5, 15, 15)))),
      ("a3", flatRings(Seq(box(12, 12, 20, 20)))),
      ("b", flatRings(Seq(box(-40, -40, -30, -30)))),
      ("n", null.asInstanceOf[Seq[Double]]))
      .toDF("poly_id", "rings")
    // fixture sanity: a1/a3 must not intersect directly
    val direct = SpatialJoins.polygonIntersectJoin(
      rows.filter(col("poly_id") === "a1")
        .select(col("poly_id").as("x_id"), col("rings").as("x_rings")),
      "x_id", "x_rings",
      rows.filter(col("poly_id") === "a3")
        .select(col("poly_id").as("y_id"), col("rings").as("y_rings")),
      "y_id", "y_rings").count()
    assert(direct == 0L)
    val got = SpatialJoins.polygonDissolve(rows, "poly_id", "rings")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1", "b" -> "b"))
  }

  test("polygonIntersectJoin equals the all-pairs predicate over mixed-size tables") {
    def h(i: Long, s: Long) = ((i * 2654435761L + s) % 2000001L) / 1000000.0 - 1.0
    def mkBoxes(n: Int, base: Long, maxHalf: Double) = (0 until n).map { i =>
      val la = 55.0 * h(base + i, 1)
      val lo = 160.0 * h(base + i, 2)
      val dla = 0.3 + maxHalf * math.abs(h(base + i, 3))
      val dlo = 0.3 + maxHalf * math.abs(h(base + i, 4))
      (s"p$base-$i", flatRings(Seq(box(la - dla, lo - dlo, la + dla, lo + dlo))))
    }
    // side A: 30 small + 6 large; side B: 24 medium + 4 very large —
    // four distinct cover-level classes exercise the re-key alignment
    val aRows = mkBoxes(30, 1000, 1.2) ++ mkBoxes(6, 2000, 14.0)
    val bRows = mkBoxes(24, 3000, 4.0) ++ mkBoxes(4, 4000, 26.0)
    val a = aRows.toDF("a_id", "a_rings")
    val b = bRows.toDF("b_id", "b_rings")
    val got = SpatialJoins.polygonIntersectJoin(a, "a_id", "a_rings", b, "b_id", "b_rings")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = a.crossJoin(b)
      .filter(cells.ringsIntersect(col("a_rings"), col("b_rings")))
      .select("a_id", "b_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(want.size > 10, s"degenerate fixture: ${want.size} intersecting pairs")
    assert(got == want,
      s"missing=${(want -- got).take(6)} extra=${(got -- want).take(6)}")
  }

  test("orderedPairs self-join equals the symmetric result filtered to a < b") {
    def h(i: Long, s: Long) = ((i * 2654435761L + s) % 2000001L) / 1000000.0 - 1.0
    val rows = (0 until 40).map { i =>
      val la = 55.0 * h(5000 + i, 1)
      val lo = 160.0 * h(5000 + i, 2)
      val dla = 0.3 + 6.0 * math.abs(h(5000 + i, 3))
      val dlo = 0.3 + 6.0 * math.abs(h(5000 + i, 4))
      (s"q$i", flatRings(Seq(box(la - dla, lo - dlo, la + dla, lo + dlo))))
    }
    val a = rows.toDF("a_id", "a_rings")
    val b = rows.toDF("b_id", "b_rings")
    val sym = SpatialJoins.polygonIntersectJoin(a, "a_id", "a_rings",
        b, "b_id", "b_rings")
      .filter(col("a_id") < col("b_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val ord = SpatialJoins.polygonIntersectJoin(a, "a_id", "a_rings",
        b, "b_id", "b_rings", orderedPairs = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(ord.forall { case (x, y) => x < y })
    assert(sym.nonEmpty && ord == sym,
      s"missing=${(sym -- ord).take(6)} extra=${(ord -- sym).take(6)}")
  }
}
