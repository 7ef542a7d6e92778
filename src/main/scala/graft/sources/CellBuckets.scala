package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}

/** Bucketed cell-table layout: persist spatially-indexed tables
  * bucketed+sorted by cell id so repeated cell equi-joins (tile x
  * image, image x image distance joins at a fixed level) are
  * co-located — the planner elides both Exchanges and sorts
  * (SortMergeJoin over pre-bucketed inputs). This is the 100 TB
  * answer to "the same join key every day": pay the shuffle once at
  * ingest, never again.
  */
object CellBuckets {
  /** Write `df` as a bucketed managed table (bucketBy requires the
    * table catalog rather than a bare path).
    */
  def writeBucketed(df: DataFrame, table: String, cellCol: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, cellCol)
      .sortBy(cellCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two tables bucketed on the same column with the same bucket
    * count — shuffle-free by construction (assert with
    * [[isShuffleFree]] in tests/CI).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   cellCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), cellCol)

  /** True when the physical plan contains no shuffle exchange
    * (broadcast exchanges are not shuffles). Walks the plan TREE for
    * ShuffleExchangeLike nodes — string matching is unreliable here:
    * ShuffleExchangeExec prints as plain "Exchange rangepartitioning/
    * RoundRobinPartitioning/...", so a substring check for
    * "ShuffleExchange" passes vacuously on shuffling plans.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // AQE wraps the real plan in AdaptiveSparkPlanExec / QueryStageExec
    // nodes that do not expose it through children, so a plain
    // collect() never sees the shuffle — descend through them manually
    def hasShuffle(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case q: QueryStageExec => hasShuffle(q.plan)
      case r: ReusedExchangeExec => hasShuffle(r.child)
      case other => other.children.exists(hasShuffle)
    }
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
