package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Sequence packing — assemble documents into fixed-token-budget
  * training bins (the "sequence packing" step of an LLM data
  * pipeline: short documents share a context window instead of
  * wasting it on padding).
  *
  * The algorithm is GREEDY IN ID ORDER within a shard: walk documents
  * by ascending id, close the current bin when the next document
  * would overflow `capacity` (a document longer than the capacity
  * gets a bin of its own). Greedy packing is inherently sequential,
  * so the SHARD is the unit of parallelism: documents are hash-
  * sharded (md5 of the id — reproducible across engines and
  * partitionings, same contract as [[Sampling.hashSample]]), each
  * shard packs independently in one kernel call, and bins are keyed
  * (shard, bin). Choose `shards` so a shard's (id, len) pairs fit
  * comfortably in an executor task (16 bytes/doc — 1M docs/shard is
  * 16 MB; at 10^12 docs, 10^6 shards keeps that bound while giving
  * ample parallelism). Nothing ever gathers to the driver, and text
  * itself is NOT carried through the pack — join the assignment back
  * by id for the materialization pass.
  */
object Packing {
  private lazy val kernelsClass: Class[_] =
    Class.forName("graft.operators.PackingKernels")

  private val entryType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("len", LongType, nullable = false))), containsNull = false)
  private val outType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bin", IntegerType, nullable = false),
    StructField("fill", LongType, nullable = false))), containsNull = false)

  /** Deterministic md5-based shard of an id in [0, shards) — the
    * same top-60-bits-of-md5 convention as [[Sampling.hashUniform]],
    * reproducible in any engine (DuckDB:
    * `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) % shards`).
    */
  def shardOf(id: Column, shards: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(shards.toLong)).cast("int")

  /** Pack `docs` into bins of at most `capacity` tokens per shard.
    * Output: one row per input doc with (idCol, shard, bin, fill)
    * where `bin` is the shard-local bin ordinal and `fill` the
    * bin's cumulative token count AFTER this doc (the last doc of a
    * bin carries the bin's final fill); re-join on idCol for the
    * length or any other payload. Rows with null length are dropped
    * by contract.
    */
  def greedyPack(docs: DataFrame, idCol: String, lenCol: String,
                 capacity: Long, shards: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    require(shards >= 1, s"shards must be >= 1 (got $shards)")
    val packed = docs.filter(col(lenCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(lenCol).cast("long").as("__len"))
      .withColumn("__shard", shardOf(col("__id"), shards))
      .groupBy("__shard")
      .agg(sort_array(collect_list(struct(col("__id").as("id"),
        col("__len").as("len")))).as("__docs"))
      .select(col("__shard"),
        explode(org.apache.spark.sql.GraftSqlBridge.staticInvoke(
          kernelsClass, outType, "greedyPack",
          Seq(col("__docs"), lit(capacity)),
          Seq(entryType, LongType))).as("__p"))
    packed.select(col("__p.id").as(idCol), col("__shard").as("shard"),
      col("__p.bin").as("bin"), col("__p.fill").as("fill"))
  }
}

/** JIT-compiled packing kernel (StaticInvoke target). */
object PackingKernels {
  /** Greedy in-order packing of (id, len) entries, pre-sorted by id:
    * returns (id, bin, fillAfter) per entry. One flat pass, no
    * allocation beyond the output.
    */
  def greedyPack(entries: ArrayData, capacity: Long): GenericArrayData = {
    val n = entries.numElements()
    val out = new Array[Any](n)
    var bin = 0
    var fill = 0L
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 2)
      val id = e.getLong(0)
      val len = e.getLong(1)
      if (i == 0) fill = len
      else if (fill + len <= capacity) fill += len
      else { bin += 1; fill = len }
      out(i) = new GenericInternalRow(Array[Any](id, bin, fill))
      i += 1
    }
    new GenericArrayData(out)
  }
}
