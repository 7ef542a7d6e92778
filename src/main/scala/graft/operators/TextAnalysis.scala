package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, built from
  * builtin (codegen'd) functions wherever the semantics allow so they
  * scale to the 100 TB documents table without UDF overhead.
  */
object TextAnalysis {
  /** Whitespace-arithmetic word count (robust across SQL dialects):
    * spaces + 1; empty text counts 0.
    */
  def wordCount(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(length(text) - length(regexp_replace(text, " ", "")) + 1)

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(translate(text, ".,!?;:", ""))
    punct.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  /** Ratio of ASCII uppercase characters (deliberately [A-Z], not
    * \p{Lu}: the quality heuristics target the shouting-caps signal
    * and the relational mirrors use the same ASCII class — accented
    * uppercase counts as ordinary text).
    */
  def upperRatio(text: Column): Column = {
    val uppers = length(text) - length(regexp_replace(text, "[A-Z]", ""))
    uppers.cast("double") / greatest(length(text), lit(1)).cast("double")
  }

  /** Mean word length. */
  def meanWordLength(text: Column): Column =
    (length(regexp_replace(text, " ", "")).cast("double") /
      greatest(wordCount(text), lit(1)).cast("double"))

  /** Stopword hit ratio against a small english list — the classic
    * cheap quality/language signal.
    */
  val EnglishStopwords: Seq[String] = Seq("the", "of", "and", "to", "in",
    "a", "is", "that", "it", "for", "was", "on", "are", "with", "as")

  def stopwordRatio(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.TextKernels"),
      org.apache.spark.sql.types.DoubleType, "stopwordRatio",
      Seq(text), Seq(org.apache.spark.sql.types.StringType))

  /** Gopher-style repetition signals over word n-grams, one JITed
    * kernel pass per call (no explode/groupBy shuffle — the
    * multiplicity table lives per row inside the kernel, so the
    * operator is map-only at any scale): [[topNgramFrac]] = share of
    * n-grams held by the single most frequent one, [[dupNgramFrac]] =
    * share of n-grams whose gram occurs >= 2 times. Both 0.0 for
    * texts shorter than n words; split contract identical to
    * [[ngramJaccard]] so the DuckDB mirrors share one tokenizer.
    */
  def topNgramFrac(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.TextKernels"),
      org.apache.spark.sql.types.DoubleType, "topNgramFrac",
      Seq(text, lit(n)),
      Seq(org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))

  def dupNgramFrac(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.TextKernels"),
      org.apache.spark.sql.types.DoubleType, "dupNgramFrac",
      Seq(text, lit(n)),
      Seq(org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))

  /** Heuristic language id from stopword families; returns a code or
    * "und". Cheap n-gram-free heuristic suited to a pre-filter pass.
    */
  val StopwordFamilies: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"))

  def langGuess(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.TextKernels"),
      org.apache.spark.sql.types.StringType, "langGuess",
      Seq(text), Seq(org.apache.spark.sql.types.StringType))

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, mixed-case, whitespace sanity.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 200.0, lit(1.0)) * when(len > 20000, 0.5).otherwise(1.0)
    val punctScore = when(punctRatio(text) > 0.2, 0.3).otherwise(1.0)
    val wordScore = when(meanWordLength(text) > 15.0 || meanWordLength(text) < 2.0, 0.4)
      .otherwise(1.0)
    round(lenScore * punctScore * wordScore, 4)
  }

  /** Token count with a BPE-ish regex segmentation: words, numbers,
    * punctuation runs each count as tokens (approximates subword
    * tokenizer budget within ~15%).
    */
  def tokenCountApprox(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.TextKernels"),
      org.apache.spark.sql.types.IntegerType, "tokenCountApprox",
      Seq(text), Seq(org.apache.spark.sql.types.StringType))

  /** 64-bit document fingerprint: min of rolling Rabin hashes over
    * character 8-grams (winnowing-lite) — equal fingerprints flag
    * near-identical prefixes/content cheaply.
    */
  def fingerprint(text: Column, basis: String = "xx"): Column = {
    // rolling hash via aggregate over the char codes of 8-gram windows
    // is expensive in pure SQL; do one hash per 8-char shingle stride 4.
    // basis "md5" swaps in the 60-bit md5 hash so the oracle gate can
    // mirror the whole fingerprint in DuckDB.
    if (basis == "md5")
      // fused kernel: the builtin per-window md5->hex->substr->conv
      // chain evaluated slower and bloated planning/codegen; values
      // are identical (DedupKernels.fingerprint60Md5 scaladoc)
      org.apache.spark.sql.GraftSqlBridge.staticInvoke(
        Class.forName("graft.operators.DedupKernels"),
        org.apache.spark.sql.types.LongType,
        "fingerprint60Md5",
        Seq(text),
        Seq(org.apache.spark.sql.types.StringType))
    else {
      val h = (c: Column) => xxhash64(c)
      // cap the SEQUENCE bound, not the hashed array: slicing after
      // transform would still hash (and materialize) every window of
      // a multi-MB document before discarding all but 512
      val shingles = transform(
        sequence(lit(0), least(
          greatest(floor((length(text) - 8) / 4).cast("int"), lit(0)), lit(511))),
        i => h(substring(text, i * 4 + 1, lit(8))))
      when(length(text) < 8, h(text)).otherwise(array_min(shingles))
    }
  }

  /** PII detection/redaction for training-data cleaning. The patterns
    * deliberately stay inside the regex subset where Java's engine
    * (Spark) and RE2 (DuckDB, Go tooling) agree exactly — character
    * classes, bounded repetition, `\b` word boundaries; no lookaround,
    * no backreferences — so the oracle gate can run the IDENTICAL
    * pattern strings in both engines. `\d` is ASCII in both.
    *
    * Redaction order matters and is fixed: emails first (an email's
    * domain may embed digits and dots an IP pattern could clip),
    * then phones, then IPv4.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-category PII match counts — map-only (regexp_count is
    * codegen'd; nothing shuffles).
    */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def piiIpv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** Replace each PII category with a typed placeholder (all
    * occurrences; email -> phone -> IPv4 in that order).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
