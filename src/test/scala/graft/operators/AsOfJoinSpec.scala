package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd

/** AsOfJoin vs a literal brute force over deterministic random
  * key/time data, across all three directions, with and without
  * tolerance, plus the documented edge contracts (null times,
  * duplicate right timestamps, left-outer semantics).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // (id, key, t) left rows; (key, t, payload) right rows
  def mkData(nL: Int, nR: Int, nKeys: Int, seed: Int):
      (Seq[(Long, Long, Double)], Seq[(Long, Double, Long)]) = {
    val left = (0 until nL).map { i =>
      (i.toLong, (rnd(seed * 7L + i) * nKeys).toLong, rnd(seed * 13L + i) * 1000.0)
    }
    val right = (0 until nR).map { i =>
      ((rnd(seed * 17L + i) * nKeys).toLong, rnd(seed * 23L + i) * 1000.0, i.toLong * 11)
    }
    (left, right)
  }

  def brute(left: Seq[(Long, Long, Double)], right: Seq[(Long, Double, Long)],
            direction: String, tol: Option[Double]): Map[Long, Option[(Double, Long)]] =
    left.map { case (id, k, t) =>
      val cands = right.filter(_._1 == k)
      def best(pred: Double => Boolean, gap: Double => Double) = {
        val c = cands.filter(r => pred(r._2))
          .filter(r => tol.forall(gap(r._2) <= _))
        // smallest gap wins; ties -> max (t, payload) like the struct rule
        if (c.isEmpty) None
        else Some(c.minBy(r => (gap(r._2), -r._2, -r._3))).map(r => (r._2, r._3))
      }
      val b = best(_ <= t, rt => t - rt)
      val f = best(_ >= t, rt => rt - t)
      val pick = direction match {
        case "backward" => b
        case "forward" => f
        case "nearest" => (b, f) match {
          case (Some(pb), Some(pf)) =>
            if (t - pb._1 <= pf._1 - t) Some(pb) else Some(pf)
          case (x, y) => x.orElse(y)
        }
      }
      id -> pick
    }.toMap

  def runJoin(left: Seq[(Long, Long, Double)], right: Seq[(Long, Double, Long)],
              direction: String, tol: Option[Double]): Map[Long, Option[(Double, Long)]] = {
    import spark.implicits._
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "rt", "payload")
    AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", direction, tol)
      .select("id", "r_rt", "r_payload").collect()
      .map { row =>
        val m = if (row.isNullAt(1)) None else Some((row.getDouble(1), row.getLong(2)))
        row.getLong(0) -> m
      }.toMap
  }

  for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(None, Some(120.0))) {
    test(s"matches brute force: direction=$dir tolerance=$tol") {
      val (l, r) = mkData(300, 200, 12, seed = dir.hashCode.abs % 97 + 1)
      assert(runJoin(l, r, dir, tol) === brute(l, r, dir, tol))
    }
  }

  test("left-outer: every left row survives, unmatched as null") {
    import spark.implicits._
    val l = Seq((1L, 5L, 10.0), (2L, 6L, 20.0)).toDF("id", "k", "t")
    val r = Seq((5L, 3.0, 99L)).toDF("k", "rt", "payload")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt")
      .select("id", "r_payload").collect().map(x =>
        (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(got === Set((1L, 99L), (2L, -1L)))
  }

  test("equal timestamps match in both directions; right dup ties resolve to max struct") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10.0)).toDF("id", "k", "t")
    // two right rows at exactly t=10 -> deterministic max-payload pick
    val r = Seq((0L, 10.0, 7L), (0L, 10.0, 42L)).toDF("k", "rt", "payload")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", dir)
        .select("r_payload").collect()
      assert(got.head.getLong(0) === 42L, dir)
    }
  }

  test("null right times never match; null left times never match") {
    import spark.implicits._
    val l = Seq((1L, 0L, Some(10.0)), (2L, 0L, None)).toDF("id", "k", "t")
    val r = Seq((0L, Some(3.0), 1L), (0L, None, 2L)).toDF("k", "rt", "payload")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", dir)
        .select("id", "r_payload").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      val want = if (dir == "backward") Set((1L, 1L), (2L, -1L))
                 else Set((1L, -1L), (2L, -1L))
      assert(got === want, dir)
    }
  }

  test("nearest ties break backward") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10.0)).toDF("id", "k", "t")
    val r = Seq((0L, 7.0, 1L), (0L, 13.0, 2L)).toDF("k", "rt", "payload")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", "nearest")
      .select("r_payload").collect()
    assert(got.head.getLong(0) === 1L)
  }

  test("plan shape: one shuffle on the key, no join node") {
    import spark.implicits._
    val l = (0 until 100).map(i => (i.toLong, i.toLong % 5, i * 1.0)).toDF("id", "k", "t")
    val r = (0 until 100).map(i => (i.toLong % 5, i * 2.0, i.toLong)).toDF("k", "rt", "payload")
    val plan = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of join must not materialize a join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("reserved and colliding column names fail fast") {
    import spark.implicits._
    val r = Seq((1L, 0.5, 2.0)).toDF("k", "rt", "value")
    val lReserved = Seq((1L, 1.0, 0.0)).toDF("k", "t", "__pick")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(lReserved, r, Seq("k"), "t", "rt")
    }
    assert(e1.getMessage.contains("__pick"))
    // a left column equal to rightPrefix + right column would silently
    // duplicate in the output select — must throw instead
    val lClash = Seq((1L, 1.0, 3.0)).toDF("k", "t", "r_value")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(lClash, r, Seq("k"), "t", "rt")
    }
    assert(e2.getMessage.contains("r_value"))
    // a different prefix resolves the clash
    assert(AsOfJoin.asOfJoin(lClash, r, Seq("k"), "t", "rt",
      rightPrefix = "x_").columns.contains("x_value"))
  }
}
