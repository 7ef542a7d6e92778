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
  * `compact` merges CHUNK = 8 levels per distributed round: cells
  * group by their level-`floor` ancestor (siblings at any level >
  * floor share that ancestor, so every possible merge above the
  * floor happens inside one group) and a local kernel compacts the
  * group bottom-up in memory. An ancestor-free group holds at most
  * Σ_{d=1..8} 4^d ≈ 87k cells — bounded by GEOMETRY, not by input
  * size, so the collect_list is safe at any scale. A cell that
  * fails to merge in its round is FINAL (all its potential siblings
  * were in the same group; later rounds only create coarser cells),
  * so each round forwards only exact-floor collapses: ⌈maxLvl/8⌉ ≤ 4
  * shuffles total where the per-level loop took up to 26. Input
  * cells must be ancestor-free (no cell containing another — true
  * of any uniform-level cover, and of any compact output);
  * duplicates are deduped up front.
  */
object CellSetOps {

  /** Levels merged per distributed round of [[compact]]. Bounds the
    * per-ancestor-group size at Σ_{d=1..Chunk} 4^d cells.
    */
  private val Chunk = 8

  /** Minimal mixed-level cover: merge complete sibling groups
    * bottom-up. Output column: `cellCol` (LongType), distinct.
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
      // floors maxLvl-8, maxLvl-16, …, always ending at 0 (the final
      // round sees levels 1..8 grouped per face root — ≤ 87k cells
      // per face by the ancestor-free bound)
      val floors =
        Iterator.iterate(maxLvl - Chunk)(_ - Chunk).takeWhile(_ > 0).toList :+ 0
      var done: List[DataFrame] = Nil
      for (floor <- floors) {
        val deep = cur.filter(col("__lvl") > floor)
        val shallow = cur.filter(col("__lvl") <= floor)
        val compacted = deep
          .groupBy(cells.ancestorAt(col("cell"), floor).as("__anc"))
          .agg(collect_list(col("cell")).as("__cs"))
          .select(explode(cells.compactGroup(col("__cs"), floor)).as("cell"))
          .withColumn("__lvl", cells.cellLevel(col("cell")))
        // levels > floor are final; exact-floor collapses may still
        // merge with siblings from other groups in a later round
        val kept = compacted.filter(col("__lvl") > floor)
          .select("cell").persist(lvlSt)
        retired += kept
        done ::= kept
        val next0 = shallow
          .unionByName(compacted.filter(col("__lvl") === floor))
          .persist(lvlSt)
        retired += next0
        next0.count() // materialize before the next round re-reads it
        cur = next0
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
