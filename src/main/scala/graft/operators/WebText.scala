package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL extraction + normalization for web-scale corpora — Common
  * Crawl-style pipelines deduplicate and filter BY normalized URL
  * before ever touching document text, so these are first-class
  * pipeline primitives, not string helpers.
  *
  * Everything is a chain of codegen'd regexp ops over patterns kept
  * inside the Java/RE2-common subset ([[TextAnalysis]] has the
  * contract), so a DuckDB/Go/Rust pipeline stage applying the same
  * patterns produces byte-identical keys. Map-only — nothing here
  * shuffles; normalization runs at scan speed.
  *
  * Normalization semantics (deliberately minimal and deterministic —
  * NOT a full WHATWG URL parser):
  *  1. drop the fragment (`#...`);
  *  2. drop tracking parameters (`utm_*`, `fbclid`, `gclid`) from
  *     the QUERY PART only (split at the first `?`, normalize every
  *     param to `&`-prefixed form, one global rule, rejoin — the
  *     `?` disappears with the last param and path `&` is never
  *     touched), then drop a dangling `?`/`&`;
  *  3. drop an explicit default port (`:80`/`:443`);
  *  4. drop one trailing slash.
  * [[urlKey]] additionally lower-cases — hosts are case-insensitive
  * and mixed-case paths are rare enough that the extra collisions are
  * the right trade for a DEDUP KEY (the normalized URL itself keeps
  * path case for fetching).
  */
object WebText {

  /** `https?` URL matcher: scheme then everything up to whitespace or
    * an HTML/quote delimiter. Trailing sentence punctuation is NOT
    * trimmed (deterministic > clever).
    */
  val UrlRe = "https?://[^ \\t\\n<>\"]+"
  // Tracking params are removed from the QUERY PART ONLY: the URL is
  // split at its first '?', a synthetic leading '&' turns every
  // param into the one mid-form shape, and one global rule removes
  // them — so an '&' (or even a 'utm_'-looking segment) in the PATH
  // is never touched, and no remove-then-repair orphan rule exists
  // to misfire. A literal second '?' inside the query is data per
  // RFC 3986 and rides along inside the preceding param's value.
  val MidTrackRe = "&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*"
  val DanglingSepRe = "[?&]$"
  val DefaultPortRe = "^(https?://[^/:?#]+):(80|443)([/?#].*)?$"
  val TrailingSlashRe = "/$"

  /** All URLs in `text`, in order, as an array (empty when none). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Count of URLs in `text`. */
  def urlCount(text: Column): Column = regexp_count(text, lit(UrlRe))

  /** Registrable host of a URL ('' when the scheme/host shape does
    * not match), lower-cased.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^https?://([^/:?#]+)", 1))

  /** The 5-step normalization above. Each step is an anchored or
    * global regexp_replace with identical behavior in Java and RE2.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val path = substring_index(noFrag, "?", 1)
    val query = when(length(noFrag) > length(path),
      noFrag.substr(length(path) + 2, length(noFrag))).otherwise(lit(""))
    val cleaned = regexp_replace(concat(lit("&"), query), MidTrackRe, "")
    val kept = cleaned.substr(lit(2), length(cleaned))
    val rejoined = concat(path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
    val noDangle = regexp_replace(rejoined, DanglingSepRe, "")
    val noPort = regexp_replace(noDangle, DefaultPortRe, "$1$3")
    regexp_replace(noPort, TrailingSlashRe, "")
  }

  /** Lower-cased normalized URL — the dedup key. */
  def urlKey(url: Column): Column = lower(normalizeUrl(url))

  /** The same normalization as DuckDB SQL over column expression
    * `c` — used by the oracle gates; kept HERE so the two engines'
    * pattern lists cannot drift apart.
    */
  def normalizeUrlSql(c: String): String = {
    val noFrag = s"regexp_replace($c, '#.*$$', '', 'g')"
    // DuckDB evaluates the argument expression once per reference at
    // the optimizer's discretion; spell it via a lambda-free nested
    // SELECT-less form by repeating the expression (values identical)
    val path = s"split_part($noFrag, '?', 1)"
    val query = s"CASE WHEN length($noFrag) > length($path) " +
      s"THEN substr($noFrag, length($path) + 2) ELSE '' END"
    val cleaned = s"regexp_replace('&' || ($query), '$MidTrackRe', '', 'g')"
    val kept = s"substr($cleaned, 2)"
    val rejoined = s"($path) || (CASE WHEN ($kept) <> '' THEN '?' || ($kept) ELSE '' END)"
    val noDangle = s"regexp_replace($rejoined, '[?&]$$', '')"
    val noPort = s"regexp_replace($noDangle, '$DefaultPortRe', '\\1\\3')"
    s"regexp_replace($noPort, '/$$', '')"
  }
}
