package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd
import graft.geo.Gade
import graft.functions.geo

/** Hausdorff track distance vs brute force; BM25 vs a hand-rolled
  * reference implementation.
  */
class TrajectoryRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hausdorff equals brute force and is symmetric") {
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    // 6 tracks of 15-25 points each
    val pts = (0 until 6).flatMap { t =>
      (0 until (15 + t * 2)).map { p =>
        val la = math.asin(2 * rnd(t * 7919L + 13) - 1) * 0.9 +
          (rnd(t * 104729L + p) - 0.5) * 0.02
        val lo = math.Pi * (2 * rnd(t * 7927L + 17) - 1) * 0.98 +
          (rnd(t * 104743L + p) - 0.5) * 0.02
        (t.toLong, p.toLong, la, lo)
      }
    }
    val ptsDf = pts.toDF("tid", "pid", "la", "lo")
      .withColumn("nv", geo.nvec(col("la"), col("lo")))
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (1L, 4L)).toDF("a", "b")
    val got = TrajectoryDist.hausdorff(ptsDf, "tid", "pid", "nv", pairs, "a", "b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    def nv(la: Double, lo: Double) = Gade.latLonToNvec(la, lo)
    val byTrack = pts.groupBy(_._1).map { case (t, ps) =>
      t -> ps.map(p => nv(p._3, p._4)) }
    def h(a: Long, b: Long) = byTrack(a).map { pa =>
      byTrack(b).map(pb => Gade.greatCircleDistanceRad(pa, pb) * R).min }.max
    for (((a, b), d) <- got) {
      val want = math.max(h(a, b), h(b, a))
      assert(math.abs(d - want) <= 1e-6 * math.max(1.0, want), s"pair ($a,$b)")
    }
    assert(got.keySet === Set((0L, 1L), (2L, 3L), (4L, 5L), (1L, 4L)))
    // symmetry: swapping the pair orientation gives the same distance
    val swapped = TrajectoryDist.hausdorff(ptsDf, "tid", "pid", "nv",
        Seq((1L, 0L)).toDF("a", "b"), "a", "b")
      .collect().head.getDouble(2)
    assert(math.abs(swapped - got((0L, 1L))) <= 1e-9)
  }

  test("bm25 equals a reference implementation on a small corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick quick fox"),
      (3L, "lorem ipsum dolor sit amet"),
      (4L, "The FOX!!! and the dog."),
      (5L, "dog dog dog dog dog"),
      (6L, "")).toDF("doc_id", "text")
    val q = Seq("fox", "dog", "missingterm")
    val got = Retrieval.bm25(docs, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // reference
    val toks = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "quick quick fox",
      3L -> "lorem ipsum dolor sit amet",
      4L -> "the fox and the dog",
      5L -> "dog dog dog dog dog",
      6L -> "").map { case (k, v) => k -> v.split(" ").filter(_.nonEmpty).toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val k1 = 1.2; val b = 0.75
    def score(id: Long): Double = q.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      if (tf == 0) 0.0 else {
        val dfT = toks.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
        idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * toks(id).size / avgdl))
      }
    }.sum
    val want = toks.keys.filter(score(_) > 0).map(k => k -> score(k)).toMap
    assert(got.keySet === want.keySet) // only matching docs appear
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) <= 1e-12 * math.max(1.0, v), s"doc $k") }
  }

  test("bm25 query terms lower-case locale-independently") {
    // under a Turkish default locale, "FIX".toLowerCase maps I to
    // dotless i and would silently match nothing; scope the locale
    // flip to the bm25() CALL (where the query-term mapping runs)
    val docs = Seq((1L, "fix the fixture")).toDF("doc_id", "text")
    val prev = java.util.Locale.getDefault
    val plan = try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      Retrieval.bm25(docs, "doc_id", "text", Seq("FIX"))
    } finally java.util.Locale.setDefault(prev)
    val rows = plan.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
  }
}
