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
  * Third addressing family next to the cube-face cells (joins/rings)
  * and web-mercator tiles (serving): geohash is the interop format —
  * ElasticSearch/Lucene/Redis geo commands all speak it.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Max precision whose axis indexes stay exact in the double
    * fraction path (12 chars = 60 bits, 30 per axis). */
  val MaxPrecision = 12

  private def clampIdx(raw: Column, n: Long): Column =
    when(raw.isNull, lit(null).cast("long"))
      .otherwise(least(lit(n - 1), greatest(lit(0L), raw.cast("long"))))

  /** Longitude axis index: floor((lon/2pi + 1/2) * 2^nbits), clamped. */
  def lonIdx(lonRad: Column, nbits: Int): Column =
    clampIdx(floor((lonRad / (2 * math.Pi) + 0.5) * (1L << nbits)), 1L << nbits)

  /** Latitude axis index: floor((lat/pi + 1/2) * 2^nbits), clamped. */
  def latIdx(latRad: Column, nbits: Int): Column =
    clampIdx(floor((latRad / math.Pi + 0.5) * (1L << nbits)), 1L << nbits)

  /** Geohash string of `precision` characters from radians. Null
    * coordinates yield null (concat propagates). */
  def encode(latRad: Column, lonRad: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"precision $precision outside [1, $MaxPrecision]")
    val bits = 5 * precision
    val nlon = (bits + 1) / 2
    val nlat = bits / 2
    val lo = lonIdx(lonRad, nlon)
    val la = latIdx(latRad, nlat)
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
