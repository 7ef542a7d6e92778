package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.SparkTestSession.rnd

/** Repetition kernels vs a literal Scala reimplementation over
  * random word streams (including non-BMP code points — the kernels
  * must count by grams, not UTF-16 slices) and pinned hand cases.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def bruteFracs(text: String, n: Int): (Double, Double) = {
    val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length < n) return (0.0, 0.0)
    val grams = (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
    val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
    val total = grams.size.toDouble
    (counts.values.max / total,
      counts.values.filter(_ >= 2).sum / total)
  }

  def evalPair(text: String, n: Int): (Double, Double) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.topNgramFrac(col("t"), n).as("a"),
        TextAnalysis.dupNgramFrac(col("t"), n).as("b"))
      .collect().head
    (r.getDouble(0), r.getDouble(1))
  }

  test("pinned cases") {
    assert(evalPair("a a a a", 2) === ((1.0, 1.0))) // "a a" x3
    assert(evalPair("x y x y z", 2) === ((0.5, 0.5))) // "x y" twice of 4
    assert(evalPair("all distinct words here", 2) === ((1.0 / 3.0, 0.0)))
    assert(evalPair("", 2) === ((0.0, 0.0)))
    assert(evalPair("one", 2) === ((0.0, 0.0)))
    assert(evalPair("Mixed CASE mixed case", 2)._2 > 0.0) // lowercasing applies
  }

  test("matches brute force on random word streams incl. non-BMP") {
    val vocab = Array("spark", "row", "agg", "🦀", "𝔘nicode", "the", "a", "join")
    for (i <- 0 until 60; n <- Seq(2, 3, 5)) {
      val len = (rnd(i * 11L + n) * 30).toInt
      val text = (0 until len)
        .map(j => vocab((rnd(i * 1000L + j) * vocab.length).toInt)).mkString(" ")
      val want = bruteFracs(text, n)
      val got = evalPair(text, n)
      assert(math.abs(got._1 - want._1) < 1e-12 &&
        math.abs(got._2 - want._2) < 1e-12,
        s"n=$n text='$text' got=$got want=$want")
    }
  }
}
