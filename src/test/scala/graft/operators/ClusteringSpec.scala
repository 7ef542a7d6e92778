package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Ellipsoids, Gade, Vec3}

/** Geodesic DBSCAN vs an independently-written brute-force reference
  * (all-pairs distances, BFS components, same min-id tie rules).
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference: (id -> (clusterOrNull, kind)). */
  private def refDbscan(pts: Seq[(Long, Vec3)], epsM: Double,
                        minPts: Int): Map[Long, (Option[Long], String)] = {
    val r = Ellipsoids.MeanEarthRadius
    val nbrs: Map[Long, Seq[Long]] = pts.map { case (i, p) =>
      i -> pts.collect { case (j, q)
        if i != j && Gade.greatCircleDistanceRad(p, q) * r <= epsM => j }
    }.toMap
    val core = pts.map(_._1).filter(i => nbrs(i).size + 1 >= minPts).toSet
    // BFS components over core-core edges; label = min core id
    var label = Map.empty[Long, Long]
    core.toSeq.sorted.foreach { s =>
      if (!label.contains(s)) {
        var seen = Set(s); var frontier = List(s)
        while (frontier.nonEmpty) {
          val nxt = frontier.flatMap(n => nbrs(n).filter(core)).filterNot(seen)
          seen ++= nxt; frontier = nxt
        }
        val m = seen.min
        seen.foreach(n => label += n -> m)
      }
    }
    pts.map { case (i, _) =>
      if (core(i)) i -> (Some(label(i)), "core")
      else {
        val coreNbrLabels = nbrs(i).filter(core).map(label)
        if (coreNbrLabels.nonEmpty) i -> (Some(coreNbrLabels.min), "border")
        else i -> (None, "noise")
      }
    }.toMap
  }

  /** Two dense blobs + a bridge point + scattered noise. */
  private val pts: Seq[(Long, Double, Double)] = {
    val blobA = (0 until 12).map(i =>
      (i.toLong, 10.0 + (i % 4) * 0.5, 20.0 + (i / 4) * 0.5))
    val blobB = (0 until 9).map(i =>
      (100L + i, -30.0 + (i % 3) * 0.4, 150.0 + (i / 3) * 0.4))
    val border = Seq((200L, 10.0 + 2.2, 20.0)) // near blob A, low degree
    val noise = (0 until 15).map(i =>
      (300L + i, -80.0 + i * 9.7, -170.0 + i * 21.3))
    blobA ++ blobB ++ border ++ noise
  }

  test("dbscan equals the brute-force reference across eps/minPts settings") {
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val vec = pts.map { case (i, la, lo) =>
      (i, Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))) }
    // budget -1 forces the contracted plan; the default budget
    // dispatches this small input to the member-pair plan — both
    // must match the reference
    for ((epsKm, minPts) <- Seq((120.0, 4), (120.0, 3), (260.0, 5), (60.0, 2));
         budget <- Seq(-1L, 100000000L)) {
      val got = Clustering.dbscan(df, "id", "n", epsKm * 1000.0, minPts,
          pairwiseBudget = budget)
        .collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))))
        .toMap
      val want = refDbscan(vec, epsKm * 1000.0, minPts)
      assert(got == want, {
        val diff = (got.keySet ++ want.keySet)
          .filter(k => got.get(k) != want.get(k)).take(6)
        s"eps=$epsKm km minPts=$minPts budget=$budget: first diffs " +
          diff.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")
      })
    }
  }

  test("planted clique straddling a contraction-cell corner stays exact") {
    // eps = 50 km -> contraction level 9 (cell ~0.45 deg); (0 N, 0 E)
    // is a 4-cell corner at any even scale, so a 2 km-radius clique
    // jittered around it splits across 4 cells and must reconnect
    // through PROVEN cell edges (tiny data radii), while a ring of
    // points seeded near exactly eps from the center exercises the
    // uncertain-annulus member fallback on both sides of the cut
    val R = Ellipsoids.MeanEarthRadius
    val eps = 50e3
    val clique = (0 until 240).map { i =>
      val ang = i * 0.7; val rad = (i % 17) * 120.0 / R
      (i.toLong, math.toDegrees(rad * math.cos(ang)),
        math.toDegrees(rad * math.sin(ang)))
    }
    val annulus = (0 until 40).map { i =>
      val d = (eps * (0.97 + 0.0015 * i)) / R // 48.5..51.4 km
      (1000L + i, math.toDegrees(d * math.cos(i * 2.1)),
        math.toDegrees(d * math.sin(i * 2.1)))
    }
    val far = (0 until 10).map(i => (2000L + i, 40.0 + i * 3.0, 90.0))
    val all = clique ++ annulus ++ far
    val df = all.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val vec = all.map { case (i, la, lo) =>
      (i, Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))) }
    val got = Clustering.dbscan(df, "id", "n", eps, 5, pairwiseBudget = -1L)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))))
      .toMap
    val want = refDbscan(vec, eps, 5)
    assert(got == want, {
      val diff = (got.keySet ++ want.keySet)
        .filter(k => got.get(k) != want.get(k)).take(8)
      diff.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")
    })
    // the clique itself must be one cluster labeled by its min id
    assert(got(0L) == ((Some(0L), "core")))
    assert(clique.forall { case (i, _, _) => got(i)._1 == Some(0L) })
  }

  test("uncertain dense-dense pairs resolve exactly through sub-cell refinement") {
    // eps = 50 km; three TIGHT dense blobs (8 points within ~1 km,
    // minPts = 5) whose center separations straddle eps so the
    // cell-level supernode bounds cannot decide either way:
    //  - B sits 49.5 km east of A -> cross pairs span ~47.4-51.6 km
    //    (+- 2x 1.05 km spread), so in-eps A-B edges exist and must
    //    be found by the sub-cell fallback while the widest pairs
    //    exceed eps;
    //  - C sits 52 km north of B with only east-west spread -> every
    //    B-C pair exceeds eps (the fallback must find nothing), yet
    //    dist - ra - rb < eps keeps the pair a candidate.
    // Asserted against the all-pairs reference at three different
    // anchor positions (cell-boundary luck varies the dense/sparse
    // split, all of which must stay exact).
    val R = Ellipsoids.MeanEarthRadius
    val eps = 50e3
    for ((baseLat, baseLon) <- Seq((30.0, 10.0), (-12.3, 77.7), (51.04, -3.9))) {
      def blob(id0: Long, latDeg: Double, lonDeg: Double) =
        (0 until 8).map { i =>
          val dl = ((i % 4) - 1.5) * (700.0 / R) // +- ~1 km, east-west only
          (id0 + i, latDeg, lonDeg + math.toDegrees(dl / math.cos(math.toRadians(latDeg))))
        }
      val dEast = math.toDegrees(49.5e3 / R / math.cos(math.toRadians(baseLat)))
      val dNorth = math.toDegrees(52e3 / R)
      val all = blob(0L, baseLat, baseLon) ++
        blob(100L, baseLat, baseLon + dEast) ++
        blob(200L, baseLat + dNorth, baseLon + dEast)
      val df = all.toDF("id", "lat", "lon")
        .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
      val vec = all.map { case (i, la, lo) =>
        (i, Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))) }
      val got = Clustering.dbscan(df, "id", "n", eps, 5, pairwiseBudget = -1L)
        .collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))))
        .toMap
      val want = refDbscan(vec, eps, 5)
      assert(got == want, {
        val diff = (got.keySet ++ want.keySet)
          .filter(k => got.get(k) != want.get(k)).take(8)
        s"base=($baseLat,$baseLon): " +
          diff.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")
      })
      // and the reference itself must encode the intended topology:
      // A+B one cluster, C a separate one
      assert(want(0L)._1 == Some(0L) && want(100L)._1 == Some(0L))
      assert(want(200L)._1 == Some(200L))
    }
  }

  test("degenerate settings: minPts=1 makes everything a core; huge eps one cluster") {
    val df = pts.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val all1 = Clustering.dbscan(df, "id", "n", 1000.0, 1, pairwiseBudget = -1L)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(all1.forall(_._2 == "core"))
    val one = Clustering.dbscan(df, "id", "n", 1.9e7, 2, pairwiseBudget = -1L)
      .select("cluster").distinct().collect()
    assert(one.length == 1 && one(0).getLong(0) == 0L)
  }
}
