package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-mercator (slippy-map / XYZ) tiling — the industry-standard
  * z/x/y scheme map and image-tile services address tiles by, plus
  * Bing-style quadkeys (the base-4 string whose prefixes are exactly
  * the ancestor tiles). Formulas are the public OSM/Bing definitions:
  * x = floor(2^z * (lon/2pi + 1/2)),
  * y = floor(2^z * (1/2 - ln(tan(lat) + sec(lat)) / 2pi)),
  * valid for |lat| <= atan(sinh(pi)) ~ 85.0511 deg; rows beyond that
  * clamp to the edge tile row (standard slippy behavior). This is a
  * second, independent index family next to the cube-face cell index
  * (graft.index.cells): cells drive joins/rings, web-mercator drives
  * tile ADDRESSING for serving and per-image tile assignment.
  *
  * Scale shape: `assign` evaluates the transcendental projection
  * ONCE per row at the finest zoom; every coarser zoom is an integer
  * shift (tile x/y) and a substring (quadkey) of the finest values —
  * exact because multiplying a [0,1) double by 2^z only scales the
  * exponent, so floor(f*2^finest) >> d == floor(f*2^(finest-d))
  * bit-for-bit (the q78 oracle recomputes every zoom DIRECTLY from
  * lat/lon, machine-checking that identity). No shuffle: assignment
  * is a pure per-row map; the zoom fan-out is a generated column.
  */
object WebMercator {

  /** Highest zoom whose fractional positions survive the
    * double->index path without precision loss (2^30 * ulp(1.0) << 1). */
  val MaxZoom = 30

  private def checkZoom(zoom: Int): Unit =
    require(zoom >= 0 && zoom <= MaxZoom, s"zoom $zoom outside [0, $MaxZoom]")

  /** Fractional x in [0, 1): lon (radians) -> share of the world width. */
  def fracX(lonRad: Column): Column = lonRad / (2 * math.Pi) + 0.5

  /** Fractional y in (-inf, +inf): mercator row share; <0 above
    * ~85.05 N, >1 below ~85.05 S (callers clamp at index time).
    * Uses the half-angle form ln(tan(pi/4 + lat/2)) == ln(tan + sec):
    * the tan+sec form catastrophically cancels at lat -> -pi/2
    * ((1+sin)/cos -> 0/0 -> a NEGATIVE tiny double -> ln = NaN ->
    * south-pole rows silently landed on tile row 0); the half-angle
    * argument goes to exactly 0 there instead, so ln -> -inf and the
    * clamp lands them on the bottom row (WebMercatorSpec pins both
    * poles). Spark's `log` returns NULL (not -inf) for non-positive
    * input — and a non-positive argument on a NON-NULL lat can only
    * mean lat at/below the south pole, so that NULL coalesces to
    * +inf and clamps to the bottom row; a NULL lat stays NULL (it
    * must not be mistaken for a pole). */
  def fracY(latRad: Column): Column =
    when(latRad.isNull, lit(null).cast("double"))
      .otherwise(coalesce(
        lit(0.5) - log(tan(lit(math.Pi / 4) + latRad / 2)) / (2 * math.Pi),
        lit(Double.PositiveInfinity)))

  /** Clamp to [0, n). Spark's greatest/least SKIP nulls (a null raw
    * index would silently clamp to tile 0), so null propagates
    * explicitly: null in, null out. Shared with [[Geohash]]. */
  private[index] def clampIdx(raw: Column, n: Long): Column =
    when(raw.isNull, lit(null).cast("long"))
      .otherwise(least(lit(n - 1), greatest(lit(0L), raw.cast("long"))))

  /** Tile column index at `zoom`, clamped to [0, 2^zoom). */
  def tileX(lonRad: Column, zoom: Int): Column = {
    checkZoom(zoom)
    clampIdx(floor(fracX(lonRad) * (1L << zoom)), 1L << zoom)
  }

  /** Tile row index at `zoom`, clamped to [0, 2^zoom) — rows beyond
    * the mercator latitude limit land on the edge row. */
  def tileY(latRad: Column, zoom: Int): Column = {
    checkZoom(zoom)
    clampIdx(floor(fracY(latRad) * (1L << zoom)), 1L << zoom)
  }

  /** Bing quadkey of tile (tx, ty) at `zoom`: `zoom` base-4 digits,
    * most-significant first, digit = x-bit + 2*y-bit. Prefix of a
    * quadkey = quadkey of the ancestor tile (pinned by spec + q78). */
  def quadkey(tx: Column, ty: Column, zoom: Int): Column = {
    checkZoom(zoom)
    if (zoom == 0) lit("")
    else concat((1 to zoom).map { i =>
      val s = zoom - i
      (shiftright(tx, s).bitwiseAND(lit(1L)) +
        shiftright(ty, s).bitwiseAND(lit(1L)) * 2).cast("string")
    }: _*)
  }

  /** Parent tile arithmetic: (tx, ty, z) -> (tx >> steps, ty >> steps). */
  def parentX(tx: Column, steps: Int = 1): Column = shiftright(tx, steps)
  def parentY(ty: Column, steps: Int = 1): Column = shiftright(ty, steps)

  /** Inverse quadkey: (tx, ty) back out of a `zoom`-character quadkey
    * string (the exact inverse of [[quadkey]], digit = x-bit + 2*y-bit
    * MSB first) as a struct (tx, ty). A null quadkey yields null tx
    * and ty FIELDS (a struct column is never itself null in Spark —
    * filter on `.getField("tx").isNull`, not the struct), including
    * at zoom 0; unrolled per character, so zoom is static like
    * everywhere else. */
  def quadkeyToXY(qk: Column, zoom: Int): Column = {
    checkZoom(zoom)
    // digit d at position i contributes ((d & 1) for x, (d >> 1) for y)
    // shifted by (zoom - i); substring/cast of a null quadkey
    // null-propagates through every term
    val terms = (1 to zoom).map { i =>
      val d = substring(qk, i, 1).cast("long")
      (shiftleft(d.bitwiseAND(lit(1L)), zoom - i),
        shiftleft(shiftright(d, 1), zoom - i))
    }
    val zero = when(qk.isNull, lit(null).cast("long")).otherwise(lit(0L))
    val tx = if (zoom == 0) zero else terms.map(_._1).reduce(_ + _)
    val ty = if (zoom == 0) zero else terms.map(_._2).reduce(_ + _)
    struct(tx.as("tx"), ty.as("ty"))
  }

  /** Tile bounds in RADIANS as a struct (lat_n, lat_s, lon_w, lon_e):
    * the inverse projection of the tile edges — lon edges are linear,
    * lat edges are atan(sinh(pi * (1 - 2*row/2^z))). NOTE these are
    * the MERCATOR-frame edges: rows clamped from beyond +-85.051 deg
    * (atan(sinh(pi))) lie inside the edge tile but outside its
    * nominal bounds. */
  def tileBounds(tx: Column, ty: Column, zoom: Int): Column = {
    checkZoom(zoom)
    val n = (1L << zoom).toDouble
    def latEdge(row: Column): Column = {
      val t = lit(math.Pi) * (lit(1.0) - row * (2.0 / n))
      atan((exp(t) - exp(-t)) / 2)
    }
    struct(
      latEdge(ty.cast("double")).as("lat_n"),
      latEdge((ty + 1).cast("double")).as("lat_s"),
      (tx.cast("double") / n * (2 * math.Pi) - math.Pi).as("lon_w"),
      ((tx + 1).cast("double") / n * (2 * math.Pi) - math.Pi).as("lon_e"))
  }

  /** Multi-zoom tile assignment: one output row per input row per
    * zoom in [coarsest, finest], with columns (zoom, tx, ty, qk)
    * appended. The projection runs once at `finest`; coarser zooms
    * derive by shift/substring (see object doc for the exactness
    * argument). Input lat/lon are radians.
    */
  def assign(df: DataFrame, latCol: String, lonCol: String,
             finest: Int, coarsest: Int = 0): DataFrame = {
    checkZoom(finest)
    require(coarsest >= 0 && coarsest <= finest,
      s"bad zoom range [$coarsest, $finest]")
    // null-coordinate rows are dropped by contract (same convention
    // as the track operators): a row with no position has no tile
    val staged = df
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .withColumn("__tx", tileX(col(lonCol), finest))
      .withColumn("__ty", tileY(col(latCol), finest))
      .withColumn("__qk", quadkey(col("__tx"), col("__ty"), finest))
    val perZoom = (coarsest to finest).map { z =>
      val d = finest - z
      struct(lit(z).as("zoom"),
        shiftright(col("__tx"), d).as("tx"),
        shiftright(col("__ty"), d).as("ty"),
        substring(col("__qk"), 1, z).as("qk"))
    }
    staged
      .withColumn("__a", explode(array(perZoom: _*)))
      .withColumn("zoom", col("__a.zoom"))
      .withColumn("tx", col("__a.tx"))
      .withColumn("ty", col("__a.ty"))
      .withColumn("qk", col("__a.qk"))
      .drop("__tx", "__ty", "__qk", "__a")
  }
}
