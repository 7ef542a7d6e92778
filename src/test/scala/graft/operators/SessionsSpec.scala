package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.SparkTestSession
import graft.SparkTestSession.rnd

/** Sessionization vs a literal per-key scan, plus the null/tie
  * contracts and the one-exchange plan shape.
  */
class SessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
  def ts(ms: Long) = new Timestamp(t0 + ms)
  val Gap = 600000L // 10 min

  // (key, ts, id): clustered bursts with deterministic quiet gaps
  def mkEvents(n: Int): Seq[(Long, Timestamp, Long)] =
    (0 until n).map { i =>
      val k = (rnd(i * 3L) * 6).toLong
      val burst = (rnd(i * 5L + 1) * 20).toLong
      val within = (rnd(i * 7L + 2) * Gap / 2).toLong // < gap/2: same session
      (k, ts(burst * 4 * Gap + within), i.toLong)
    }

  def brute(rows: Seq[(Long, Timestamp, Long)]): Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(_._2.getTime)
      var idx = 0L
      var prev = Long.MinValue
      sorted.map { case (_, t, id) =>
        if (prev == Long.MinValue || t.getTime - prev > Gap) idx += 1
        prev = t.getTime
        id -> idx
      }
    }

  test("session assignment matches the per-key scan") {
    import spark.implicits._
    val rows = mkEvents(400)
    val got = Sessions.sessionize(rows.toDF("k", "ts", "id"), "k", "ts", Gap)
      .select("id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute(rows))
  }

  test("stats aggregate the same sessions; null timestamps are dropped") {
    import spark.implicits._
    val rows = mkEvents(300)
    val withNull = rows :+ ((1L, null.asInstanceOf[Timestamp], 999L))
    val stats = Sessions.sessionStats(withNull.toDF("k", "ts", "id"), "k", "ts", Gap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val want = brute(rows).toSeq.map { case (id, s) =>
      val (k, t, _) = rows.find(_._3 == id).get
      ((k, s), t.getTime)
    }.groupBy(_._1).map { case (ks, g) =>
      val times = g.map(_._2)
      ks -> ((g.size.toLong, times.min, times.max, times.max - times.min))
    }
    assert(stats === want)
  }

  test("equal timestamps share a session deterministically") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0), 1L), (1L, ts(0), 2L), // tied at the key's start
      (1L, ts(Gap + 1), 3L), (1L, ts(Gap + 1), 4L))
    for (_ <- 1 to 3) {
      val got = Sessions.sessionize(rows.toDF("k", "ts", "id"), "k", "ts", Gap)
        .select("id", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    }
  }

  test("castable string timestamps sessionize chronologically, not lexicographically") {
    import spark.implicits._
    // "2026-10-01" < "2026-2-01" as STRINGS but is 8 months later as
    // time — the window must order by the same millis the gap uses
    val rows = Seq(
      (1L, "2026-2-01 00:00:00", 1L),
      (1L, "2026-2-01 00:05:00", 2L),
      (1L, "2026-10-01 00:00:00", 3L))
    val got = Sessions.sessionize(rows.toDF("k", "ts", "id"), "k", "ts", Gap)
      .select("id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("plan shape: stats reuse the sessionize exchange (one shuffle total)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // AQE hides stages from children — walk them explicitly (the same
    // trap CellBuckets.isShuffleFree documents)
    def shuffles(p: SparkPlan): Int = p match {
      case _: ShuffleExchangeLike => 1 + p.children.map(shuffles).sum
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case r: ReusedExchangeExec => shuffles(r.child)
      case other => other.children.map(shuffles).sum
    }
    val df = mkEvents(200).toDF("k", "ts", "id")
    val stats = Sessions.sessionStats(df, "k", "ts", Gap)
    stats.collect() // finalize the adaptive plan
    val n = shuffles(stats.queryExecution.executedPlan)
    assert(n == 1,
      s"expected 1 exchange, got $n:\n${stats.queryExecution.executedPlan}")
  }
}
