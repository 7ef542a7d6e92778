package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.index.{cells, WebMercator}

/** Tile-pyramid rollup: per-tile aggregates (row count + optional
  * double sums) at EVERY level from `finest` up to `coarsest` — the
  * multi-resolution tile statistics a map/tiling service serves
  * (points per tile, bytes per tile at each zoom). Two index
  * families share one re-aggregation loop: the cube-face cell grid
  * ([[rollup]]) and web-mercator XYZ tiles ([[tileRollup]]).
  *
  * Scale shape: the data is scanned and shuffled ONCE, at the finest
  * level; every coarser level aggregates the PREVIOUS level's
  * aggregates via exact parent arithmetic (no re-encode, no second
  * scan). Shuffle volume above the base is bounded by the tile count
  * at each level (6·4^l cells / 4^z tiles) — independent of input
  * size — where the naive multi-resolution explode shuffles
  * rows × levels. All rollups land in one DAG (one action executes
  * the whole pyramid), and count/sum re-aggregate losslessly so every
  * level is exactly what a direct groupBy at that level would produce
  * (spec- and oracle-pinned for both families).
  */
object Pyramid {

  /** Shared lossless re-aggregation loop: `base` carries the key
    * columns `keys`, aggregates (n + <sum>_sum) and `levelCol` =
    * `finest`; `parentKeys` maps the key columns to the parent
    * level's keys. Output column order: (levelCol, keys..., n, sums).
    */
  private def pyramidLoop(base: DataFrame, keys: Seq[String],
                          parentKeys: Seq[Column] => Seq[Column],
                          levelCol: String, finest: Int, coarsest: Int,
                          sumCols: Seq[String]): DataFrame = {
    var cur = base
    var out = cur
    val rollAggs = sum("n").as("n") +:
      sumCols.map(c => sum(s"${c}_sum").as(s"${c}_sum"))
    for (l <- finest - 1 to coarsest by -1) {
      val pks = parentKeys(keys.map(col)).zip(keys).map { case (e, k) => e.as(k) }
      cur = cur
        .drop(levelCol)
        .groupBy(pks: _*)
        .agg(rollAggs.head, rollAggs.tail: _*)
        .withColumn(levelCol, lit(l))
      out = out.unionByName(cur)
    }
    out.select((levelCol +: keys).map(col) ++
      (col("n") +: sumCols.map(c => col(s"${c}_sum"))): _*)
  }

  /** Cell-grid pyramid over [[graft.index.cells]].
    * @return (level, cell, n, <sum cols>) — one row per non-empty
    *         cell per level.
    */
  def rollup(df: DataFrame, nvecCol: String, finest: Int,
             coarsest: Int = 0, sumCols: Seq[String] = Nil): DataFrame = {
    require(coarsest >= 0 && coarsest <= finest &&
      finest <= graft.index.CellIndex.MaxLevel,
      s"bad level range [$coarsest, $finest]")
    val baseAggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"${c}_sum"))
    val base = df
      .groupBy(cells.cellAt(col(nvecCol), finest).as("cell"))
      .agg(baseAggs.head, baseAggs.tail: _*)
      .withColumn("level", lit(finest))
    pyramidLoop(base, Seq("cell"),
      ks => Seq(cells.parentCell(ks.head)),
      "level", finest, coarsest, sumCols)
  }

  /** Web-mercator XYZ pyramid over [[graft.index.WebMercator]]:
    * parent arithmetic is (tx >> 1, ty >> 1). Null lat/lon rows are
    * dropped by the same contract as WebMercator.assign.
    * @return (zoom, tx, ty, n, <sum cols>) — one row per non-empty
    *         tile per zoom.
    */
  def tileRollup(df: DataFrame, latCol: String, lonCol: String,
                 finest: Int, coarsest: Int = 0,
                 sumCols: Seq[String] = Nil): DataFrame = {
    require(finest >= 0 && finest <= WebMercator.MaxZoom &&
      coarsest >= 0 && coarsest <= finest,
      s"bad zoom range [$coarsest, $finest]")
    val baseAggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"${c}_sum"))
    val base = df
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .groupBy(WebMercator.tileX(col(lonCol), finest).as("tx"),
        WebMercator.tileY(col(latCol), finest).as("ty"))
      .agg(baseAggs.head, baseAggs.tail: _*)
      .withColumn("zoom", lit(finest))
    pyramidLoop(base, Seq("tx", "ty"),
      ks => Seq(WebMercator.parentX(ks.head), WebMercator.parentY(ks(1))),
      "zoom", finest, coarsest, sumCols)
  }
}
