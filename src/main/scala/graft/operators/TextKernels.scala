package graft.operators

import org.apache.spark.unsafe.types.UTF8String

/** Static entry points for `StaticInvoke` codegen over the text
  * analysis operators. Semantics MATCH the column-expression forms
  * they replace bit-for-bit (same split contract, same tie-breaks) so
  * the DuckDB oracle SQL is unchanged; the win is evaluation speed —
  * higher-order array lambdas (`filter`, `aggregate`) run interpreted
  * per element, which made a 15-stopword scan over 5000 documents
  * cost ~2 s at sf0.1.
  */
object TextKernels {

  /** Mirrors `split(lower(text), " ")`: Java regex split, limit -1
    * (trailing empties kept — a denominator detail the oracle SQL
    * reproduces).
    */
  private def words(text: UTF8String): Array[String] =
    text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)

  // derived from the PUBLIC TextAnalysis constants (the ones the q35
  // oracle SQL is generated from) — a second hardcoded copy here
  // would let the lists drift apart from what the gate checks
  private val Stopwords: Array[String] = TextAnalysis.EnglishStopwords.toArray

  /** Occurrence-counting stopword hit ratio over space-split words. */
  def stopwordRatio(text: UTF8String): Double = {
    val ws = words(text)
    var hits = 0
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      var j = 0
      var hit = false
      while (j < Stopwords.length && !hit) { hit = w == Stopwords(j); j += 1 }
      if (hit) hits += 1
      i += 1
    }
    hits.toDouble / math.max(ws.length, 1)
  }

  // sorted by code — ties resolve to the lexicographically greatest
  // code, matching greatest() over (hits, code) structs; derived from
  // the public TextAnalysis map the oracle SQL mirrors
  private val Families: Array[(String, Array[String])] =
    TextAnalysis.StopwordFamilies.toArray.sortBy(_._1)
      .map { case (c, ws) => (c, ws.toArray) }

  /** Stopword-family language guess; "und" when no family scores. */
  def langGuess(text: UTF8String): UTF8String = {
    val ws = words(text)
    var bestHits = -1
    var bestCode = ""
    var f = 0
    while (f < Families.length) {
      val (code, sws) = Families(f)
      var hits = 0
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        var j = 0
        var hit = false
        while (j < sws.length && !hit) { hit = w == sws(j); j += 1 }
        if (hit) hits += 1
        i += 1
      }
      // strictly greater OR equal-with-greater-code wins, so the
      // scan order (code ascending) makes ties pick the max code
      if (hits > bestHits || (hits == bestHits && code > bestCode)) {
        bestHits = hits; bestCode = code
      }
      f += 1
    }
    UTF8String.fromString(if (bestHits >= 1) bestCode else "und")
  }

  private val TokenBoundary =
    java.util.regex.Pattern.compile("""(?U)(?<=\W)|(?=\W)""")

  /** BPE-ish token count: split at word/non-word boundaries (same Java
    * regex the expression form used), count tokens that are non-empty
    * and not a single space.
    */
  def tokenCountApprox(text: UTF8String): Int = {
    val parts = TokenBoundary.split(text.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && p != " ") n += 1
      i += 1
    }
    n
  }

  /** Exact word n-gram Jaccard — kernel form of
    * [[Dedup.ngramJaccard]]'s column expression: same tokenization
    * (`split(lower(text), " ")` keeping empties), distinct n-grams
    * joined by one space, |intersection| / max(|union|, 1). Integer set
    * arithmetic, so kernel and expression agree bit-for-bit; null
    * inputs yield null via StaticInvoke's propagateNull.
    */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    def grams(t: UTF8String): java.util.HashSet[String] = {
      val ws = words(t)
      val out = new java.util.HashSet[String]()
      val m = math.max(ws.length - n, 0)
      var i = 0
      while (i <= m) {
        val sb = new java.lang.StringBuilder()
        val end = math.min(i + n, ws.length)
        var j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(ws(j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
      out
    }
    val ga = grams(a)
    val gb = grams(b)
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    inter.toDouble / math.max(union, 1).toDouble
  }

  /** Multiplicity table of overlapping word n-grams (same split and
    * join contract as [[ngramJaccard]]'s gram builder).
    */
  private def gramCounts(text: UTF8String, n: Int): java.util.HashMap[String, Int] = {
    val ws = words(text)
    val out = new java.util.HashMap[String, Int]()
    if (ws.length < n) return out
    var i = 0
    val m = ws.length - n
    while (i <= m) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      val k = sb.toString
      out.put(k, out.getOrDefault(k, 0) + 1)
      i += 1
    }
    out
  }

  /** Fraction of n-grams that are the single most frequent n-gram —
    * the Gopher-style repetition signal (word-count form). 0.0 when
    * the text has fewer than n words.
    */
  def topNgramFrac(text: UTF8String, n: Int): Double = {
    val counts = gramCounts(text, n)
    if (counts.isEmpty) return 0.0
    var top = 0
    var total = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      total += c
      if (c > top) top = c
    }
    top.toDouble / total.toDouble
  }

  /** Fraction of n-grams whose gram occurs at least twice (mass of
    * duplicated n-grams). 0.0 when the text has fewer than n words.
    */
  def dupNgramFrac(text: UTF8String, n: Int): Double = {
    val counts = gramCounts(text, n)
    if (counts.isEmpty) return 0.0
    var dup = 0
    var total = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      total += c
      if (c >= 2) dup += c
    }
    dup.toDouble / total.toDouble
  }
}
