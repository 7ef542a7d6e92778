package graft.functions

import org.apache.spark.sql.{Column, SparkSession, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** SQL-callable registration of the geodesy surface: every function is
  * built from the same Column DSL (builtin expressions / StaticInvoke)
  * so `spark.sql` users get identical semantics and codegen as the
  * DataFrame API — no UDF wrappers.
  */
object GeoFunctions {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftSqlBridge.column(e)

  /** name -> (arity, columns => column) */
  val registry: Map[String, (Int, Seq[Column] => Column)] = Map(
    "geo_nvec" -> (2, { case Seq(lat, lon) => geo.nvec(lat, lon) }),
    "geo_lat" -> (1, { case Seq(n) => geo.lat(n) }),
    "geo_lon" -> (1, { case Seq(n) => geo.lon(n) }),
    "geo_gc_distance" -> (4, { case Seq(a, b, cc, d) => geo.gcDistanceLatLon(a, b, cc, d) }),
    "geo_chord_distance" -> (4, { case Seq(a, b, cc, d) =>
      geo.euclideanDistance(geo.nvec(a, b), geo.nvec(cc, d)) }),
    "geo_azimuth" -> (4, { case Seq(a, b, cc, d) =>
      geo.azimuth(geo.nvec(a, b), geo.nvec(cc, d)) }),
    "geo_geodesic_distance" -> (4, { case Seq(a, b, cc, d) =>
      geo.geodesicDistance(a, b, cc, d) }),
    "geo_cell" -> (3, { case Seq(lat, lon, level) =>
      graft.index.cells.cellAt(geo.nvec(lat, lon), litInt(level))
    }),
    "geo_interpolate_lat" -> (5, { case Seq(a, b, cc, d, t) =>
      geo.latDeg(geo.interpolate(geo.nvec(a, b), geo.nvec(cc, d), t)) }),
    "geo_cross_track" -> (6, { case Seq(a1la, a1lo, a2la, a2lo, bla, blo) =>
      geo.crossTrackDistance(geo.nvec(a1la, a1lo), geo.nvec(a2la, a2lo),
        geo.nvec(bla, blo)) }),
    "geo_cell_parent" -> (2, { case Seq(cell, steps) =>
      graft.index.cells.parentCell(cell, litInt(steps)) }),
    "geo_ring_cells" -> (2, { case Seq(cell, k) =>
      graft.index.cells.ringCells(cell, litInt(k)) }),
    "geo_cap_cells" -> (4, { case Seq(lat, lon, level, angleRad) =>
      graft.index.cells.capCells(geo.nvec(lat, lon), litInt(level),
        litDouble(angleRad)) }),
    "geo_hamming" -> (2, { case Seq(a, b) =>
      graft.operators.Dedup.hamming(a, b) }),
    "geo_minhash" -> (2, { case Seq(text, buckets) =>
      graft.operators.Dedup.minHashSignatureOnePerm(text,
        numBuckets = litInt(buckets)) }),
    // ---- addressing families (geohash / web-mercator tiles) --------
    "geo_geohash" -> (3, { case Seq(latDeg, lonDeg, precision) =>
      graft.index.Geohash.encodeDeg(latDeg, lonDeg, litInt(precision)) }),
    "geo_tile_x" -> (2, { case Seq(lonDeg, zoom) =>
      graft.index.WebMercator.tileX(radians(lonDeg), litInt(zoom)) }),
    "geo_tile_y" -> (2, { case Seq(latDeg, zoom) =>
      graft.index.WebMercator.tileY(radians(latDeg), litInt(zoom)) }),
    "geo_quadkey" -> (3, { case Seq(tx, ty, zoom) =>
      graft.index.WebMercator.quadkey(tx, ty, litInt(zoom)) }),
    "geo_quadkey_xy" -> (2, { case Seq(qk, zoom) =>
      graft.index.WebMercator.quadkeyToXY(qk, litInt(zoom)) }),
    "geo_tile_bounds" -> (3, { case Seq(tx, ty, zoom) =>
      graft.index.WebMercator.tileBounds(tx, ty, litInt(zoom)) }),
    // ---- cell-set arithmetic (compact / uncompact) ------------------
    "geo_cell_children" -> (2, { case Seq(cell, targetLevel) =>
      graft.index.cells.descendantCells(cell, litInt(targetLevel)) }),
    "geo_cells_compact" -> (2, { case Seq(cellArr, floor) =>
      graft.index.cells.compactGroup(cellArr, litInt(floor)) }),
    // ---- polygon analysis -------------------------------------------
    // vertex arrays are the same flat [x0,y0,z0,...] n-vector encoding
    // the DataFrame operators use; build one from lat/lon pairs with
    // geo_nvec + array(), or ship it as a literal
    "geo_polygon_area" -> (1, { case Seq(vertsArr) =>
      // same flat encoding as the other polygon functions; regroup
      // into the n-vector structs polygonAreaArr consumes. Malformed
      // shapes fail LOUDLY like the ring-list kernels do — a
      // truncated division would silently drop trailing doubles and
      // return a plausible wrong area (e.g. for a lat/lon-pair array
      // passed by mistake)
      val sz = size(vertsArr)
      val structs = transform(
        sequence(lit(0), (sz / 3).cast("int") - 1),
        i => geo.vec(element_at(vertsArr, i * 3 + 1),
          element_at(vertsArr, i * 3 + 2),
          element_at(vertsArr, i * 3 + 3)))
      when(vertsArr.isNull, lit(null).cast("double"))
        .when(sz % 3 === 0 && sz >= 9, geo.polygonAreaArr(structs))
        .otherwise(raise_error(concat(
          lit("geo_polygon_area: flat [x0,y0,z0,...] n-vector array " +
            "with >= 3 vertices expected (got length "),
          sz.cast("string"), lit(")")))) }),
    "geo_polygon_perimeter" -> (1, { case Seq(vertsArr) =>
      // same flat encoding, regrouping, and loud-failure contract as
      // geo_polygon_area
      val sz = size(vertsArr)
      val structs = transform(
        sequence(lit(0), (sz / 3).cast("int") - 1),
        i => geo.vec(element_at(vertsArr, i * 3 + 1),
          element_at(vertsArr, i * 3 + 2),
          element_at(vertsArr, i * 3 + 3)))
      when(vertsArr.isNull, lit(null).cast("double"))
        .when(sz % 3 === 0 && sz >= 9, geo.polygonPerimeterArr(structs))
        .otherwise(raise_error(concat(
          lit("geo_polygon_perimeter: flat [x0,y0,z0,...] n-vector " +
            "array with >= 3 vertices expected (got length "),
          sz.cast("string"), lit(")")))) }),
    // segment-segment crossing (lat/lon in degrees): the exact
    // route-route intersection predicate, endpoint touches included
    "geo_segs_cross" -> (8, { case Seq(a1la, a1lo, a2la, a2lo,
                                       b1la, b1lo, b2la, b2lo) =>
      graft.index.cells.segsCross(
        geo.nvecDeg(a1la, a1lo), geo.nvecDeg(a2la, a2lo),
        geo.nvecDeg(b1la, b1lo), geo.nvecDeg(b2la, b2lo)) }),
    "geo_pip" -> (3, { case Seq(latDeg, lonDeg, vertsArr) =>
      graft.index.cells.pointInPolygon(geo.nvecDeg(latDeg, lonDeg), vertsArr) }),
    "geo_boundary_dist" -> (3, { case Seq(latDeg, lonDeg, vertsArr) =>
      graft.index.cells.boundaryDistSigned(
        geo.nvecDeg(latDeg, lonDeg), vertsArr) *
        lit(graft.geo.Ellipsoids.MeanEarthRadius) }),
    // ring-list encoding [k, n_0..n_{k-1}, coords...] for holes /
    // multipolygons (SpatialJoins.AoiM.flatRings)
    "geo_pip_rings" -> (3, { case Seq(latDeg, lonDeg, ringsArr) =>
      graft.index.cells.pointInPolygonRings(geo.nvecDeg(latDeg, lonDeg), ringsArr) }),
    "geo_boundary_dist_rings" -> (3, { case Seq(latDeg, lonDeg, ringsArr) =>
      graft.index.cells.boundaryDistSignedRings(
        geo.nvecDeg(latDeg, lonDeg), ringsArr) *
        lit(graft.geo.Ellipsoids.MeanEarthRadius) })
  )

  /** Foldable int literal argument (levels, ring sizes, bucket counts
    * feed driver-side cover/coefficient construction). The foldable
    * check comes first: eval(null) on a column reference throws an
    * opaque internal exception instead of this message.
    */
  private def foldableExpr(c0: Column) = {
    val e = GraftSqlBridge.expression(c0)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"argument must be a literal (got non-foldable expression $e)")
    e
  }

  private def litInt(c0: Column): Int =
    foldableExpr(c0).eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"argument must be an integer literal, got $other")
    }

  private def litDouble(c0: Column): Double =
    foldableExpr(c0).eval(null) match {
      case d: Double => d
      case f: java.math.BigDecimal => f.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(
        s"argument must be a numeric literal, got $other")
    }

  /** Register every function as a session temp function. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, (arity, builder)) =>
      GraftSqlBridge.registerFunction(spark, name, arity, builder)
    }
}
