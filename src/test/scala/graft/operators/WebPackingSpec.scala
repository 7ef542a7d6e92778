package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class WebPackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def norm(u: String): String =
    Seq(u).toDF("u").select(WebText.normalizeUrl(col("u")).as("n"))
      .collect()(0).getString(0)

  test("normalizeUrl: each rule and their composition") {
    assert(norm("https://a.com/x#frag") == "https://a.com/x")
    assert(norm("https://a.com/x?utm_source=1&id=2&utm_b=3") == "https://a.com/x?id=2")
    assert(norm("https://a.com/x?utm_source=1") == "https://a.com/x")
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com/x/") == "http://a.com/x")
    assert(norm("https://EX0.COM:443/a0?utm_source=x&id=0#f") == "https://EX0.COM/a0?id=0")
    // untouched: non-default port, real params, no trailing slash
    assert(norm("https://a.com:8443/x?id=2") == "https://a.com:8443/x?id=2")
    // '&' as a PATH sub-delim with no query: must NOT be rewritten
    // into a '?' (the old remove-then-repair orphan rule did)
    assert(norm("https://ex.com/a&b=2") == "https://ex.com/a&b=2")
    assert(norm("https://ex.com/a&b?utm_source=1&c=3") == "https://ex.com/a&b?c=3")
    // only tracking params: query gone entirely, no dangling '?'
    assert(norm("https://a.com/x?utm_a=1&utm_b=2") == "https://a.com/x")
    // tracking-LOOKING segment in the PATH (no '?'): untouched
    assert(norm("https://ex.com/a&utm_source=x/b") == "https://ex.com/a&utm_source=x/b")
    // a second literal '?' is DATA inside the preceding param's value
    assert(norm("https://h/p?utm_a=1&x=1?utm_b=2&y=2") == "https://h/p?x=1?utm_b=2&y=2")
    assert(norm("https://h/p?x=1?utm_b=2") == "https://h/p?x=1?utm_b=2")
  }

  test("extractUrls / urlCount / urlHost") {
    val row = Seq("go to https://A.com/x and http://b.io/y?z=1 now")
      .toDF("t")
      .select(WebText.extractUrls(col("t")).as("us"),
        WebText.urlCount(col("t")).as("c"),
        WebText.urlHost(lit("https://A.com:443/x")).as("h"))
      .collect()(0)
    assert(row.getSeq[String](0) == Seq("https://A.com/x", "http://b.io/y?z=1"))
    assert(row.getInt(1) == 2)
    assert(row.getString(2) == "a.com")
    val none = Seq("no links here").toDF("t")
      .select(WebText.extractUrls(col("t")).as("us")).collect()(0)
    assert(none.getSeq[String](0).isEmpty)
  }

  test("greedyPack: hand-computed bins, oversized doc isolated") {
    // single shard so the walk is the full id order
    val docs = Seq((1L, 50L), (2L, 60L), (3L, 80L), (4L, 90L), (5L, 300L), (6L, 10L))
      .toDF("doc_id", "len")
    val out = Packing.greedyPack(docs, "doc_id", "len", capacity = 200, shards = 1)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3)))).toMap
    // walk: 50 -> 110 -> 190 | 90 | 300(oversized) | 10
    assert(out(1L) == ((0, 50L)) && out(2L) == ((0, 110L)) && out(3L) == ((0, 190L)))
    assert(out(4L) == ((1, 90L)))
    assert(out(5L) == ((2, 300L)), "oversized doc must take a bin of its own")
    assert(out(6L) == ((3, 10L)), "bin after an oversized doc starts fresh")
  }

  test("greedyPack: partitioning-invariant and every bin within capacity except oversized singletons") {
    val docs = (1L to 500L).map(i => (i, (i * 37 % 120) + 1)).toDF("doc_id", "len")
    val a = Packing.greedyPack(docs, "doc_id", "len", 256, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    val b = Packing.greedyPack(docs.repartition(13), "doc_id", "len", 256, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).sortBy(_._1)
    assert(a.sameElements(b), "packing must not depend on input partitioning")
    val fills = a.groupBy(t => (t._2, t._3)).values.map(_.map(_._4).max)
    assert(fills.forall(_ <= 256L), "no multi-doc bin may exceed capacity here (no len > 256)")
    assert(a.length == 500)
  }

  test("greedyPack: contracts") {
    val docs = Seq((1L, 5L)).toDF("doc_id", "len")
    intercept[IllegalArgumentException] {
      Packing.greedyPack(docs, "doc_id", "len", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Packing.greedyPack(docs, "doc_id", "len", 10, 0)
    }
    val withNull = Seq((1L, Option(5L)), (2L, Option.empty[Long])).toDF("doc_id", "len")
    assert(Packing.greedyPack(withNull, "doc_id", "len", 10, 1).count() == 1L)
  }
}
