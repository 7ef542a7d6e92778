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
  *  2. drop tracking parameters (`utm_*`, `fbclid`, `gclid`);
  *  3. repair a parameter list whose leading `?` was consumed by (2)
  *     (`path&id=2` -> `path?id=2`) and drop a dangling `?`/`&`;
  *  4. drop an explicit default port (`:80`/`:443`);
  *  5. drop one trailing slash.
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
  // Tracking-param removal preserves separators BY CONSTRUCTION
  // (three cases: non-leading, leading-with-kept-successor, leading-
  // at-end) instead of remove-then-repair: a repair regex keyed on
  // "first '&' with no '?' before it" would also fire on URLs whose
  // PATH legitimately contains '&' (an RFC 3986 sub-delim) and no
  // query at all, rewriting /a&b=2 into /a?b=2 — a different URL.
  private val TrackingParam = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"
  val MidTrackRe = s"&$TrackingParam=[^&]*"
  val LeadTrackKeepRe = s"\\?$TrackingParam=[^&]*&"
  val LeadTrackOnlyRe = s"\\?$TrackingParam=[^&]*$$"
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
    val noMid = regexp_replace(noFrag, MidTrackRe, "")
    val noLeadKeep = regexp_replace(noMid, LeadTrackKeepRe, "?")
    val noTrack = regexp_replace(noLeadKeep, LeadTrackOnlyRe, "")
    val noDangle = regexp_replace(noTrack, DanglingSepRe, "")
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
    val s1 = s"regexp_replace($c, '#.*$$', '', 'g')"
    val s2 = s"regexp_replace($s1, '$MidTrackRe', '', 'g')"
    val s2b = s"regexp_replace($s2, '$LeadTrackKeepRe', '?')"
    val s3 = s"regexp_replace($s2b, '$LeadTrackOnlyRe', '')"
    val s4 = s"regexp_replace($s3, '[?&]$$', '')"
    val s5 = s"regexp_replace($s4, '$DefaultPortRe', '\\1\\3')"
    s"regexp_replace($s5, '/$$', '')"
  }
}
