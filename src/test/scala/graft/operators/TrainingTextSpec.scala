package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Boilerplate / LangModel / PII — the round-4 training-data text
  * family, hand-computed on corpora small enough to check by eye.
  */
class TrainingTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three docs share the 3-gram "the quick fox"; doc 4 is unrelated;
  // doc 5 is too short for any 3-gram; doc 6 is null text
  def corpus = Seq(
    (1L, Option("see the quick fox run")),
    (2L, Option("the quick fox sleeps")),
    (3L, Option("catch the quick fox")),
    (4L, Option("unrelated words entirely here")),
    (5L, Option("two words")),
    (6L, Option.empty[String])
  ).toDF("doc_id", "text")

  test("sharedNgramStats: shared fraction is exact and null/short rows follow contract") {
    val out = Boilerplate.sharedNgramStats(corpus, "doc_id", "text",
        n = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: grams {see the quick, the quick fox, quick fox run} -> 1 shared of 3
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 1L, 0.5)))
    assert(out(4L) == ((2L, 0L, 0.0)))
    assert(out(5L) == ((0L, 0L, 0.0)), "doc shorter than n must emit 0 grams, frac 0")
    assert(!out.contains(6L), "null text rows are dropped by contract")
  }

  test("sharedNgramStats: minDocs=2 counts the doc itself") {
    val out = Boilerplate.sharedNgramStats(corpus, "doc_id", "text",
        n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "the quick fox" appears in docs 1,2,3 — shared for all three at minDocs=2
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L && out(4L) == 0L)
  }

  test("sharedNgramStats: md5 and xx bases agree on the fraction") {
    val a = Boilerplate.sharedNgramStats(corpus, "doc_id", "text", n = 2, minDocs = 2, basis = "xx")
      .select("doc_id", "shared_grams").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Boilerplate.sharedNgramStats(corpus, "doc_id", "text", n = 2, minDocs = 2, basis = "md5")
      .select("doc_id", "shared_grams").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("distinctGramHashes: sorted, distinct, code-point safe") {
    val row = Seq(("a b a b 😀 b")).toDF("t")
      .select(Boilerplate.gramHashes(col("t"), 2).as("g"))
      .collect()(0).getSeq[Long](0)
    // grams: "a b", "b a", "a b", "b 😀", "😀 b" -> 4 distinct
    assert(row.length == 4)
    assert(row == row.sorted, "hash array must be sorted ascending")
  }

  test("unigramScore: add-k arithmetic matches hand computation") {
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val model = LangModel.unigramCounts(train, "text") // a->2, b->1; N=3, V=2
    val out = LangModel.unigramScore(
        Seq((9L, "a c")).toDF("doc_id", "text"), "doc_id", "text", model, k = 0.5)
      .collect()(0)
    val denom = 3.0 + 0.5 * 3.0 // N + k(V+1)
    val expect = (-math.log(2.5 / denom) + -math.log(0.5 / denom)) / 2.0
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - expect) < 1e-12,
      s"avg_nll ${out.getDouble(2)} != $expect")
    assert(math.abs(out.getDouble(3) - math.exp(expect)) < 1e-9)
  }

  test("unigramScore: model tokens score below unseen tokens; k must be positive") {
    val train = Seq((1L, "x x x x y")).toDF("doc_id", "text")
    val model = LangModel.unigramCounts(train, "text")
    val score = LangModel.unigramScore(
        Seq((1L, "x x x"), (2L, "q q q")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(score(1L) < score(2L), "in-model doc must have lower avg nll")
    intercept[IllegalArgumentException] {
      LangModel.unigramScore(train, "doc_id", "text", model, k = 0.0)
    }
  }

  test("contamination: overlap counts and flag against an eval slice") {
    val train = Seq(
      (1L, "the quick fox ran far away today"), // holds eval's "the quick fox" + "quick fox ran"
      (2L, "nothing in common with it at all"),
      (3L, "the quick fox")                     // exactly one eval gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "see the quick fox ran")).toDF("doc_id", "text")
    val out = Contamination.overlapStats(train, "doc_id", "text", eval, "text",
        n = 3, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((5L, 2L, true)))
    assert(out(2L) == ((5L, 0L, false)))
    assert(out(3L) == ((1L, 1L, false)), "below minOverlap must not flag")
  }

  test("contamination: null eval text and short docs follow contract") {
    val train = Seq((1L, Option("too short")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val eval = Seq((1L, Option.empty[String]), (2L, Option("a b c d")))
      .toDF("doc_id", "text")
    val out = Contamination.overlapStats(train, "doc_id", "text", eval, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L && !out.contains(2L))
  }

  test("PII counts and redaction: all three categories, order preserved") {
    val txt = "mail a.b+c@ex-1.org or x@y.io, call +1-555-123-4567, host 10.0.255.7 done"
    val out = Seq((1L, txt)).toDF("id", "text")
      .select(
        TextAnalysis.piiEmailCount(col("text")).as("e"),
        TextAnalysis.piiPhoneCount(col("text")).as("p"),
        TextAnalysis.piiIpv4Count(col("text")).as("i"),
        TextAnalysis.redactPii(col("text")).as("r"))
      .collect()(0)
    assert(out.getInt(0) == 2 && out.getInt(1) == 1 && out.getInt(2) == 1)
    assert(out.getString(3) ==
      "mail [EMAIL] or [EMAIL], call [PHONE], host [IP] done")
  }

  test("PII redaction: clean text passes through untouched") {
    val txt = "no personal data here, just words and 12 numbers like 3.14"
    val r = Seq((1L, txt)).toDF("id", "text")
      .select(TextAnalysis.redactPii(col("text")).as("r")).collect()(0).getString(0)
    assert(r == txt)
  }
}
