package graft.operators

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static entry points for `StaticInvoke` codegen over the dedup
  * operators (object without companion class => static forwarders).
  */
object DedupKernels {

  /** 64-bit string hash: FNV-1a over UTF-8 bytes + splitmix avalanche.
    * Deterministic across JVMs; only self-consistency matters (the
    * "xx" basis is never oracle-compared).
    */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit value of the first 15 hex chars of the md5 digest — equal
    * to Spark `conv(substr(md5(x),1,15),16,10)` and DuckDB
    * `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)`, which is what
    * makes the "md5" basis DuckDB-oracle-comparable.
    */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val d = md5Local.get(); d.reset()
    val out = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v >>> 4 // 15 hex chars = first 7.5 bytes
  }

  /** One-permutation MinHash signature of `text` in a single pass
    * (Li, Owen, Zhang NIPS 2012; densified per Shrivastava & Li ICML
    * 2014): shingle -> one 64-bit hash -> bucket by floorMod ->
    * signed min per bucket; empty buckets borrow from the nearest
    * non-empty bucket scanning circularly upward (rotation
    * densification), so short documents keep unbiased-ish agreement
    * instead of spuriously matching on co-empty buckets.
    *
    * Shingling matches [[Dedup.shingles]]: k-char substrings of the
    * lowercased text, stride 1, first `cap` kept; text shorter than k
    * contributes itself as the single shingle.
    *
    * basis "xx" = fnv64 (fast path); "md5" = [[md5Hash60]] (the
    * DuckDB-mirrorable gate basis). ~numHashes times fewer hash
    * evaluations than the seeded-permutation signature.
    */
  /** Code points of `s` — shingle indexing must count CODE POINTS
    * (what Spark's `length`/`substring` and DuckDB count), not UTF-16
    * units: indexing a raw Java String would slice surrogate pairs in
    * half on non-BMP text and diverge from the expression forms the
    * oracle gates mirror.
    */
  private def codePoints(s: String): Array[Int] = s.codePoints().toArray

  /** Shingle plan matching the expression form exactly: the COUNT
    * comes from the PRE-lowercase code-point length (the expression's
    * `sequence` bound uses `length(text)` before `lower()`), while
    * the slices index the LOWERCASED code points with substring-style
    * clamping — lowercasing can change length (U+0130 -> "i" + dot),
    * and counting the lowered text would shift every shingle versus
    * the expression/oracle form.
    */
  private def shinglePlan(raw: String, k: Int, cap: Int): (Array[Int], Int) = {
    val preN = raw.codePointCount(0, raw.length)
    val cps = codePoints(raw.toLowerCase(java.util.Locale.ROOT))
    (cps, math.min(if (preN <= k) 1 else preN - k + 1, cap))
  }

  private def shingleAt(cps: Array[Int], i: Int, k: Int): String =
    if (i >= cps.length) "" else new String(cps, i, math.min(k, cps.length - i))

  def onePermMinHash(text: UTF8String, k: Int, cap: Int, numBuckets: Int,
                     basis: UTF8String): GenericArrayData = {
    val (cps, nShingles) = shinglePlan(text.toString, k, cap)
    val md5 = basis.toString == "md5"
    val mins = Array.fill(numBuckets)(Long.MaxValue)
    val seen = new Array[Boolean](numBuckets)
    var i = 0
    while (i < nShingles) {
      val sh = shingleAt(cps, i, k)
      val bytes = sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = if (md5) md5Hash60(bytes) else fnv64(bytes)
      val b = java.lang.Math.floorMod(h, numBuckets.toLong).toInt
      if (h < mins(b)) mins(b) = h
      seen(b) = true
      i += 1
    }
    val out = new Array[Long](numBuckets)
    var b = 0
    while (b < numBuckets) {
      if (seen(b)) out(b) = mins(b)
      else {
        var j = 1
        while (j < numBuckets && !seen((b + j) % numBuckets)) j += 1
        out(b) = if (j < numBuckets) mins((b + j) % numBuckets) else Long.MaxValue
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Fused md5-basis SimHash: k-shingles of the lowercased text
    * (identical to [[Dedup.shingles]]), [[md5Hash60]] per shingle,
    * then the [[simHashVotes]] bit-vote fold — one pass, no
    * intermediate hash array. Value-identical to
    * `simHashVotes(transform(shingles(text), hash60md5))`, which the
    * DuckDB oracle mirrors relationally; the builtin per-shingle
    * md5->hex->substr->conv chain both evaluated slower and bloated
    * planning/codegen (the gate pays cold-plan cost once per query).
    */
  def simHash60Md5(text: UTF8String, k: Int, cap: Int): Long = {
    val (cps, nShingles) = shinglePlan(text.toString, k, cap)
    val votes = new Array[Int](64)
    var i = 0
    while (i < nShingles) {
      val h = md5Hash60(shingleAt(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** PRODUCTION-basis SimHash: [[simHash60Md5]]'s vote loop over the
    * fast fnv64 shingle hash instead of md5 — the basis for pipelines
    * that never oracle-compare (the md5 basis exists so DuckDB can
    * replay the signature; it costs ~an md5 per shingle). Full 64-bit
    * signatures (no 60-bit cut needed — nothing parses them back
    * through a SQL engine).
    */
  def simHash64Fast(text: UTF8String, k: Int, cap: Int): Long = {
    val (cps, nShingles) = shinglePlan(text.toString, k, cap)
    val votes = new Array[Int](64)
    var i = 0
    while (i < nShingles) {
      val h = fnv64(shingleAt(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** md5-basis rolling fingerprint ([[TextAnalysis.fingerprint]]
    * semantics): min [[md5Hash60]] over 8-char windows at stride 4
    * (first 512 windows) of the text as-is (no lowercasing); text
    * shorter than 8 chars hashes whole. Value-identical to the
    * builtin-expression md5 path it replaces.
    */
  def fingerprint60Md5(text: UTF8String): Long = {
    val s = text.toString
    val cps = codePoints(s)
    val n = cps.length
    if (n < 8)
      return md5Hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val nWin = math.min((n - 8) / 4 + 1, 512)
    var min = Long.MaxValue
    var i = 0
    while (i < nWin) {
      val v = md5Hash60(new String(cps, i * 4, 8)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (v < min) min = v
      i += 1
    }
    min
  }

  /** SimHash bit-vote fold over an array of shingle hashes: for each
    * of the 64 bit positions, count +1/-1 votes across hashes and set
    * the bit when the vote is non-negative — exactly the semantics of
    * the column-expression form (aggregate per bit), but as ONE JITed
    * pass instead of 64 interpreted higher-order aggregates (the
    * expression tree made the signature ~90x slower than its own
    * md5 stage at sf0.1).
    */
  def simHashVotes(hashes: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Sorted DISTINCT word-n-gram hashes of the lowercased text — the
    * per-document explode payload for corpus-level boilerplate
    * detection ([[Boilerplate.sharedNgramStats]]). Split contract
    * matches [[TextKernels]].gramCounts: `split(lower(text), " ")`
    * keeping empties, FULL n-grams only (fewer than n words yields an
    * empty array), grams joined by one space before hashing. basis
    * "xx" = fnv64 (fast path); "md5" = [[md5Hash60]] (the
    * DuckDB-mirrorable gate basis). Sorted ascending so the array
    * value itself is deterministic in oracle dumps.
    */
  def distinctGramHashes(text: UTF8String, n: Int, basis: UTF8String): GenericArrayData = {
    val ws = text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length < n) return new GenericArrayData(new Array[Long](0))
    val md5 = basis.toString == "md5"
    val set = new java.util.TreeSet[java.lang.Long]()
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
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      set.add(if (md5) md5Hash60(bytes) else fnv64(bytes))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
