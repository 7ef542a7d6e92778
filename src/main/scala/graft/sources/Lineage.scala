package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition lineage + row-count metrics (north_rule: "every
  * partition emits lineage + row-count metrics into snapshots").
  * A single mapPartitions pass tags rows with their physical
  * partition id and stage attempt, aggregated into one small metrics
  * table suitable for a snapshot commit alongside the data.
  */
object Lineage {
  /** (partition_id, rows, task_attempt) per physical partition of
    * `df`. `task_attempt` is the attempt whose output SURVIVED commit
    * (under retries/speculation that need not be the first attempt
    * launched).
    */
  def partitionMetrics(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.mapPartitions { it =>
      val ctx = TaskContext.get()
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single((ctx.partitionId(), n, ctx.taskAttemptId()))
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong))
      .toDF("partition_id", "rows", "task_attempt")
    counts.orderBy("partition_id")
  }

  /** Commit `df` as a snapshot together with its per-partition
    * metrics (a sibling `<name>__metrics` snapshot in the same store
    * version history). The metrics come from the commit's own
    * manifest — parquet footers + committer file names — so the data
    * is computed and scanned exactly ONCE; `df` is never re-executed.
    */
  def commitWithMetrics(store: SnapshotStore, name: String, df: DataFrame): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = store.commit(name, df)
    val metrics = store.fileMetrics(v).toDF("partition_id", "rows", "file")
    store.commit(s"${name}__metrics", metrics)
    v
  }
}
