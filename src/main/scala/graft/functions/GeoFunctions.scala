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
        numBuckets = litInt(buckets)) })
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
