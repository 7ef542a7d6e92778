package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.cells

/** Tile-pyramid rollup: per-cell aggregates (row count + optional
  * double sums) at EVERY level from `finest` up to `coarsest` — the
  * multi-resolution tile statistics a map/tiling service serves
  * (points per tile, bytes per tile at each zoom).
  *
  * Scale shape: the data is scanned and shuffled ONCE, at the finest
  * level; every coarser level aggregates the PREVIOUS level's
  * aggregates via exact parent-cell arithmetic (no re-encode, no
  * second scan). Shuffle volume above the base is Σ_l 6·4^l rows of
  * pre-aggregated cells — independent of input size — where the
  * naive multi-resolution explode shuffles rows × levels. All
  * rollups land in one DAG (one action executes the whole pyramid),
  * and count/sum re-aggregate losslessly so every level is exactly
  * what a direct groupBy at that level would produce (spec-pinned).
  *
  * Output: (cell, level, n, <sum cols>) — one row per non-empty cell
  * per level.
  */
object Pyramid {

  def rollup(df: DataFrame, nvecCol: String, finest: Int,
             coarsest: Int = 0, sumCols: Seq[String] = Nil): DataFrame = {
    require(coarsest >= 0 && coarsest <= finest &&
      finest <= graft.index.CellIndex.MaxLevel,
      s"bad level range [$coarsest, $finest]")
    val baseAggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c)).as(s"${c}_sum"))
    var cur = df
      .groupBy(cells.cellAt(col(nvecCol), finest).as("cell"))
      .agg(baseAggs.head, baseAggs.tail: _*)
      .withColumn("level", lit(finest))
    var out = cur
    val rollAggs = sum("n").as("n") +:
      sumCols.map(c => sum(s"${c}_sum").as(s"${c}_sum"))
    for (l <- finest - 1 to coarsest by -1) {
      cur = cur
        .drop("level")
        .groupBy(cells.parentCell(col("cell")).as("cell"))
        .agg(rollAggs.head, rollAggs.tail: _*)
        .withColumn("level", lit(l))
      out = out.unionByName(cur)
    }
    out
  }
}
