package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Hash sampling: partitioning-independence (the property Spark's own
  * sample lacks), rate accuracy, stratified quotas and determinism.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ids(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 7}", s"src${i % 3}"))
      .toDF("id", "lang", "source")
  }

  test("hashSample is a pure function of the data, not the partitioning") {
    val df = ids(5000)
    val a = Sampling.hashSample(df, "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(17), "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(df.coalesce(1), "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b && b === c)
    // rate lands near the target (md5 uniformity at n=5000)
    assert(math.abs(a.size / 5000.0 - 0.2) < 0.02, s"rate ${a.size / 5000.0}")
  }

  test("hashSample: different salts draw different sets; nested fractions nest") {
    val df = ids(5000)
    val s1 = Sampling.hashSample(df, "id", 0.2, "a").select("id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, "id", 0.2, "b").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 !== s2)
    // a 10% draw is a subset of the 20% draw under the same salt —
    // the property that lets a pipeline grow its sample without
    // resampling from scratch
    val s3 = Sampling.hashSample(df, "id", 0.1, "a").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(s3.subsetOf(s1))
  }

  test("stratifiedSample: exact quota per stratum, short strata intact, deterministic") {
    val df = ids(2100) // 21 (lang, source) strata x 100
    val got = Sampling.stratifiedSample(df, Seq("lang", "source"), "id", 10)
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getLong(0)))
    val byStratum = got.groupBy(_._1)
    assert(byStratum.size == 21 && byStratum.values.forall(_.size == 10))
    // repartition-invariance
    val again = Sampling.stratifiedSample(df.repartition(13), Seq("lang", "source"), "id", 10)
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getLong(0))).toSet
    assert(again === got.toSet)
    // a stratum smaller than the quota survives whole
    val tiny = Sampling.stratifiedSample(ids(12), Seq("lang"), "id", 10)
    assert(tiny.count() == 12)
    // nested quotas: top-5 is a prefix of top-10
    val five = Sampling.stratifiedSample(df, Seq("lang", "source"), "id", 5)
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getLong(0))).toSet
    assert(five.subsetOf(got.toSet))
  }

  test("hashSample plan is map-only (no exchange)") {
    val plan = Sampling.hashSample(ids(100), "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), plan)
  }
}
