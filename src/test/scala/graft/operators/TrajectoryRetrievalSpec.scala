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

  test("frechet equals an independent memoized recursion; dominates hausdorff; detects reversal") {
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    val pts = (0 until 6).flatMap { t =>
      (0 until (12 + t * 2)).map { p =>
        val la = math.toRadians(5.0 + t * 3 + p * 0.15 + 0.4 * math.sin(p * 0.6 + t))
        val lo = math.toRadians(-20.0 + t * 2 + p * 0.25 + 0.3 * math.cos(p * 0.9 + t))
        (t.toLong, p.toLong, la, lo)
      }
    }
    val ptsDf = pts.toDF("tid", "pid", "la", "lo")
      .withColumn("nv", geo.nvec(col("la"), col("lo")))
    // track 10 = track 0 REVERSED (same point set, opposite order)
    val rev = pts.filter(_._1 == 0L).map { case (_, p, la, lo) =>
      (10L, (11 - p), la, lo) }
    val all = (pts ++ rev).toDF("tid", "pid", "la", "lo")
      .withColumn("nv", geo.nvec(col("la"), col("lo")))
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (1L, 4L), (0L, 10L)).toDF("a", "b")
    val got = TrajectoryDist.frechet(all, "tid", "pid", "nv", pairs, "a", "b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    def nv(la: Double, lo: Double) = Gade.latLonToNvec(la, lo)
    val byTrack = (pts ++ rev).groupBy(_._1).map { case (t, ps) =>
      t -> ps.sortBy(_._2).map(p => nv(p._3, p._4)).toIndexedSeq }
    // independent reference: memoized top-down recursion
    def refFrechet(a: IndexedSeq[graft.geo.Vec3], b: IndexedSeq[graft.geo.Vec3]): Double = {
      val memo = collection.mutable.Map.empty[(Int, Int), Double]
      def d(i: Int, j: Int) = Gade.greatCircleDistanceRad(a(i), b(j))
      def go(i: Int, j: Int): Double = memo.getOrElseUpdate((i, j), {
        val dij = d(i, j)
        if (i == 0 && j == 0) dij
        else if (i == 0) math.max(go(0, j - 1), dij)
        else if (j == 0) math.max(go(i - 1, 0), dij)
        else math.max(math.min(go(i - 1, j),
          math.min(go(i - 1, j - 1), go(i, j - 1))), dij)
      })
      go(a.length - 1, b.length - 1)
    }
    got.foreach { case ((a, b), dm) =>
      val want = refFrechet(byTrack(a), byTrack(b)) * R
      assert(math.abs(dm - want) <= 1e-9 * math.max(1.0, want),
        s"pair ($a,$b): $dm vs $want")
    }
    // symmetry
    val sw = TrajectoryDist.frechet(all, "tid", "pid", "nv",
        Seq((1L, 0L)).toDF("a", "b"), "a", "b").collect().head.getDouble(2)
    assert(math.abs(sw - got((0L, 1L))) <= 1e-9)
    // dominance: frechet >= hausdorff on every pair
    val h = TrajectoryDist.hausdorff(all, "tid", "pid", "nv", pairs, "a", "b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, f) =>
      assert(f >= h(k) - 1e-9, s"pair $k: frechet $f < hausdorff ${h(k)}")
    }
    // order-awareness: reversed twin is hausdorff-0 but frechet-far
    assert(h((0L, 10L)) <= 1e-9)
    assert(got((0L, 10L)) > 1000.0, s"frechet to reversed twin ${got((0L, 10L))}")
  }

  test("dtw equals an independent memoized recursion; dominates frechet; zero on identical tracks") {
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    val pts = (0 until 6).flatMap { t =>
      (0 until (12 + t * 2)).map { p =>
        val la = math.toRadians(5.0 + t * 3 + p * 0.15 + 0.4 * math.sin(p * 0.6 + t))
        val lo = math.toRadians(-20.0 + t * 2 + p * 0.25 + 0.3 * math.cos(p * 0.9 + t))
        (t.toLong, p.toLong, la, lo)
      }
    }
    // track 20 = exact copy of track 0 (identical point sequence)
    val twin = pts.filter(_._1 == 0L).map { case (_, p, la, lo) => (20L, p, la, lo) }
    val all = (pts ++ twin).toDF("tid", "pid", "la", "lo")
      .withColumn("nv", geo.nvec(col("la"), col("lo")))
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (1L, 4L), (0L, 20L)).toDF("a", "b")
    val got = TrajectoryDist.dtw(all, "tid", "pid", "nv", pairs, "a", "b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    def nv(la: Double, lo: Double) = Gade.latLonToNvec(la, lo)
    val byTrack = (pts ++ twin).groupBy(_._1).map { case (t, ps) =>
      t -> ps.sortBy(_._2).map(p => nv(p._3, p._4)).toIndexedSeq }
    // independent reference: memoized top-down recursion
    def refDtw(a: IndexedSeq[graft.geo.Vec3], b: IndexedSeq[graft.geo.Vec3]): Double = {
      val memo = collection.mutable.Map.empty[(Int, Int), Double]
      def d(i: Int, j: Int) = Gade.greatCircleDistanceRad(a(i), b(j))
      def go(i: Int, j: Int): Double = memo.getOrElseUpdate((i, j), {
        val dij = d(i, j)
        if (i == 0 && j == 0) dij
        else if (i == 0) go(0, j - 1) + dij
        else if (j == 0) go(i - 1, 0) + dij
        else math.min(go(i - 1, j),
          math.min(go(i - 1, j - 1), go(i, j - 1))) + dij
      })
      go(a.length - 1, b.length - 1)
    }
    got.foreach { case ((a, b), dm) =>
      val want = refDtw(byTrack(a), byTrack(b)) * R
      assert(math.abs(dm - want) <= 1e-9 * math.max(1.0, want),
        s"pair ($a,$b): $dm vs $want")
    }
    // symmetry (the DP and its transpose share the optimal coupling)
    val sw = TrajectoryDist.dtw(all, "tid", "pid", "nv",
        Seq((1L, 0L)).toDF("a", "b"), "a", "b").collect().head.getDouble(2)
    assert(math.abs(sw - got((0L, 1L))) <= 1e-9)
    // dominance: dtw sums along its optimal coupling, so it is >= the
    // max along that coupling >= the frechet optimum
    val f = TrajectoryDist.frechet(all, "tid", "pid", "nv", pairs, "a", "b")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, v) =>
      assert(v >= f(k) - 1e-9, s"pair $k: dtw $v < frechet ${f(k)}")
    }
    // identical tracks align point-for-point at zero cost
    assert(got((0L, 20L)) <= 1e-9, s"dtw to identical twin ${got((0L, 20L))}")
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
