package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash encoding (the public geohash.org / Wikipedia scheme): the
  * base-32 string whose bits interleave longitude (even bit
  * positions, MSB first) and latitude (odd), 5 bits per character,
  * alphabet 0-9 b-z minus a/i/l/o. The textbook bisection loop is
  * equivalent to ONE floor per axis — lonBits = floor((lon/2pi + 1/2)
  * * 2^nlon), latBits = floor((lat/pi + 1/2) * 2^nlat) — the same
  * floor-of-fraction form as the web-mercator tiler, so the whole
  * encode is a flat codegen-friendly Column expression (no UDF, no
  * loop) and mirrors verbatim into the DuckDB oracle. Prefix
  * property: truncating 5 trailing bits = flooring both axis indexes
  * one level coarser, so the precision-(p-1) geohash is exactly the
  * first p-1 characters (spec-pinned).
  *
  * Domain caveat: geohash buckets are defined by DEGREE bisection,
  * and the dyadic-degree boundaries (180*k/2^n) are NOT exactly
  * representable after a degree->radian conversion — an input lying
  * exactly on such a boundary can land one bucket low through the
  * radian form ([[encode]]). Feed degrees through [[encodeDeg]] when
  * bit-for-bit interop with ES/Lucene/Redis matters: lat/180 and
  * lon/360 are EXACT for dyadic-degree inputs, so encodeDeg matches
  * the textbook bisection loop on boundaries too (spec-pinned with a
  * boundary sweep). Off-boundary points (anything not within an ulp
  * of a 180*k/2^n degree line) agree through both forms.
  *
  * Third addressing family next to the cube-face cells (joins/rings)
  * and web-mercator tiles (serving): geohash is the interop format —
  * ElasticSearch/Lucene/Redis geo commands all speak it.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Max precision whose axis indexes stay exact in the double
    * fraction path (12 chars = 60 bits, 30 per axis). */
  val MaxPrecision = 12

  private def checkBits(nbits: Int): Unit =
    require(nbits >= 1 && nbits <= 30, s"axis bits $nbits outside [1, 30]")

  /** Longitude axis index: floor((lon/2pi + 1/2) * 2^nbits), clamped. */
  def lonIdx(lonRad: Column, nbits: Int): Column = {
    checkBits(nbits)
    WebMercator.clampIdx(
      floor((lonRad / (2 * math.Pi) + 0.5) * (1L << nbits)), 1L << nbits)
  }

  /** Latitude axis index: floor((lat/pi + 1/2) * 2^nbits), clamped. */
  def latIdx(latRad: Column, nbits: Int): Column = {
    checkBits(nbits)
    WebMercator.clampIdx(
      floor((latRad / math.Pi + 0.5) * (1L << nbits)), 1L << nbits)
  }

  /** Degree-domain axis indexes: exact on dyadic-degree boundaries
    * (see object doc). */
  def lonIdxDeg(lonDeg: Column, nbits: Int): Column = {
    checkBits(nbits)
    WebMercator.clampIdx(
      floor((lonDeg / 360.0 + 0.5) * (1L << nbits)), 1L << nbits)
  }
  def latIdxDeg(latDeg: Column, nbits: Int): Column = {
    checkBits(nbits)
    WebMercator.clampIdx(
      floor((latDeg / 180.0 + 0.5) * (1L << nbits)), 1L << nbits)
  }

  /** Geohash string of `precision` characters from radians. Null
    * coordinates yield null (concat propagates). Boundary caveat in
    * the object doc — use [[encodeDeg]] for strict interop. */
  def encode(latRad: Column, lonRad: Column, precision: Int): Column =
    encodeIdx(latIdx(latRad, _), lonIdx(lonRad, _), precision)

  /** Geohash string from DEGREES — bit-for-bit equal to the textbook
    * bisection loop including inputs exactly on bucket boundaries. */
  def encodeDeg(latDeg: Column, lonDeg: Column, precision: Int): Column =
    encodeIdx(latIdxDeg(latDeg, _), lonIdxDeg(lonDeg, _), precision)

  private def encodeIdx(latAt: Int => Column, lonAt: Int => Column,
                        precision: Int): Column = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"precision $precision outside [1, $MaxPrecision]")
    val bits = 5 * precision
    val nlon = (bits + 1) / 2
    val nlat = bits / 2
    val lo = lonAt(nlon)
    val la = latAt(nlat)
    def bitAt(k: Int): Column =
      if (k % 2 == 0) shiftright(lo, nlon - 1 - k / 2).bitwiseAND(lit(1L))
      else shiftright(la, nlat - 1 - (k - 1) / 2).bitwiseAND(lit(1L))
    val alpha = typedLit(Alphabet.map(_.toString))
    val chars = (0 until precision).map { c =>
      val value = (0 until 5).map(j => bitAt(5 * c + j) * (1L << (4 - j)))
        .reduce(_ + _)
      element_at(alpha, (value + 1).cast("int"))
    }
    concat(chars: _*)
  }
}
