package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set operations over cell-id covers (the H3 compact/uncompact
  * pair, on this index's cube-face quadtree): `compact` replaces
  * every complete 4-sibling group by its parent, recursively, giving
  * the minimal mixed-level cover of the same region; `uncompact`
  * explodes a (possibly mixed-level) cover back to a uniform level.
  *
  * Why it matters at scale: AOI covers, rasterized regions, and
  * zone-map cell lists shrink by ~4x per merged level — a compacted
  * cover broadcast to 1000 executors or stored per snapshot is
  * proportionally smaller, and a prefix/range join against a
  * compacted cover touches far fewer keys.
  *
  * `compact` is a driver loop over levels (max 26 rounds, one
  * shuffle each on a strictly shrinking set): per level, group by
  * parent, groups of exactly 4 merge and re-enter one level up,
  * the rest are emitted. Input cells must be ancestor-free (no cell
  * containing another — true of any uniform-level cover, and of any
  * compact output); duplicates are deduped up front.
  */
object CellSetOps {

  /** Minimal mixed-level cover: merge complete sibling groups
    * bottom-up. Output column: `cellCol` (LongType), distinct.
    *
    * Iterative: each level's round persists + re-bases the remaining
    * set as a LEAF plan (`createDataFrame(rdd, schema)`) — without
    * that, round r's plan nests all rounds before it and Catalyst
    * optimization time explodes with depth (the same hazard
    * `Dedup.connectedComponents` hit and fixed the same way).
    */
  def compact(df: DataFrame, cellCol: String): DataFrame = {
    val spark = df.sparkSession
    val lvlSt = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = df.select(col(cellCol).cast("long").as("cell")).distinct()
      .withColumn("__lvl", cells.cellLevel(col("cell")))
      .persist(lvlSt)
    val retired = scala.collection.mutable.ListBuffer.empty[DataFrame]
    retired += cur
    try {
      val maxRow = cur.agg(max("__lvl")).collect()(0)
      if (maxRow.isNullAt(0)) return cur.select(col("cell").as(cellCol))
      val maxLvl = maxRow.getLong(0).toInt
      var done: List[DataFrame] = Nil
      for (l <- maxLvl to 1 by -1) {
        val atL = cur.filter(col("__lvl") === l)
          .withColumn("__p", cells.parentCell(col("cell")))
        val rest = cur.filter(col("__lvl") =!= l)
        // a parent has exactly 4 possible children and cur is
        // distinct, so count == 4 <=> the sibling group is complete
        val full = atL.groupBy("__p").agg(count(lit(1)).as("__n"))
          .filter(col("__n") === 4).select(col("__p").as("__fp"))
        val kept = atL.join(full, atL("__p") === full("__fp"), "left_anti")
          .select("cell").persist(lvlSt)
        retired += kept
        done ::= kept
        val merged = full.select(col("__fp").as("cell"))
          .withColumn("__lvl", lit((l - 1).toLong))
        val next0 = rest.unionByName(merged).persist(lvlSt)
        retired += next0
        next0.count() // materialize before re-basing
        cur = spark.createDataFrame(next0.toDF().rdd, next0.schema)
      }
      // Materialize the final cover at the RDD level rather than
      // Dataset.persist: CacheManager would pin a Dataset cache until
      // the caller explicitly unpersists (and compaction callers —
      // AOI covers, per-snapshot cell lists — loop), whereas RDD
      // cache blocks are released by the ContextCleaner once the
      // returned frame becomes unreachable. Count runs before the
      // finally releases the per-round parents; on executor loss the
      // blocks recompute through the (bounded-depth) RDD lineage.
      val outRows = (cur.select("cell") :: done).reduce(_ unionByName _)
        .select(col("cell").as(cellCol))
      val outRdd = outRows.toDF().rdd.persist(lvlSt)
      val out = spark.createDataFrame(outRdd, outRows.schema)
      out.count()
      out
    } finally {
      retired.foreach(_.unpersist(blocking = false))
    }
  }

  /** Uniform-level cover from a (possibly mixed-level) one. Cells
    * already at or deeper than `targetLevel` pass through unchanged
    * (see [[cells.descendantCells]]).
    */
  def uncompact(df: DataFrame, cellCol: String, targetLevel: Int): DataFrame =
    df.withColumn(cellCol,
      explode(cells.descendantCells(col(cellCol).cast("long"), targetLevel)))
}
