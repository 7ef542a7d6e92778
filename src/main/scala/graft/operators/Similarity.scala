package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor operators over embedding columns
  * (`array<float>`). Vector math is builtin `zip_with`/`aggregate`
  * (codegen'd, no UDFs). Brute force is the correctness baseline;
  * the scale path is random-hyperplane LSH bucketing so candidate
  * generation is an equi-join instead of a cross join.
  */
object Similarity {
  /** Dot product of two float-array columns (accumulated in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v))

  /** Exact top-k by cosine: cross join + per-query window. The
    * O(Q*N) baseline — correct at any scale where Q is small or as
    * the verifier for the LSH path.
    */
  def bruteForceTopK(queries: DataFrame, data: DataFrame,
                     qVec: String, dVec: String, qId: String, dId: String,
                     k: Int, simCol: String = "cosine"): DataFrame = {
    val w = Window.partitionBy(qId).orderBy(col(simCol).desc, col(dId))
    queries.crossJoin(data)
      .withColumn(simCol, cosine(col(qVec), col(dVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component (splitmix64 ->
    * [-1, 1)).
    */
  private def hyperplane(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val m = graft.sources.ImageTable.mix(seed.toLong * 131071 + i)
      (m >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products
    * with fixed deterministic hyperplanes, packed into a Long.
    */
  def lshSignature(vec: Column, dim: Int, bits: Int = 16): Column = {
    val bitCols = (0 until bits).map { s =>
      val h = hyperplane(s, dim)
      val planeDot = aggregate(
        zip_with(vec, array(h.map(lit): _*), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(planeDot >= 0, shiftleft(lit(1L), s)).otherwise(lit(0L))
    }
    bitCols.reduce[Column]((a, b) => a.bitwiseOR(b))
  }

  /** Band keys over the LSH signature (bandBits-sized chunks). Equal
    * band key => candidate pair.
    */
  def lshBands(sig: Column, bits: Int = 16, bandBits: Int = 4): Column = {
    val mask = (1L << bandBits) - 1
    array((0 until bits / bandBits).map { b =>
      // tag with band index so different bands never collide
      shiftright(sig, b * bandBits).bitwiseAND(lit(mask))
        .bitwiseOR(lit((b + 1).toLong << 60))
    }: _*)
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket
    * self-join then exact cosine filter — the embedding analogue of
    * MinHash text dedup (pairs are candidates only when they share a
    * signature band, so candidate volume stays linear for
    * non-degenerate data). Returns (id_a, id_b, cosine), id_a < id_b.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        bits: Int = 16, bandBits: Int = 8): DataFrame = {
    val banded = Dedup.spreadSmallInput(df)
      .select(col(idCol).as("__id"), col(vecCol).as("__vec"))
      .withColumn("__band",
        explode(lshBands(lshSignature(col("__vec"), dim, bits), bits, bandBits)))
    val left = banded.select(col("__band"), col("__id").as("id_a"),
      col("__vec").as("__vec_a"))
    val right = banded.select(col("__band"), col("__id").as("id_b"),
      col("__vec").as("__vec_b"))
    left.join(right, "__band")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__vec_a", "__vec_b")
      .distinct()
      .withColumn("cosine", cosine(col("__vec_a"), col("__vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Query-side multi-probe band keys: each band's exact key plus its
    * `bandBits` hamming-1 variants — near-miss sign flips on single
    * hyperplanes stop costing candidates (standard multi-probe LSH).
    */
  def lshProbeBands(sig: Column, bits: Int = 16, bandBits: Int = 4): Column = {
    val mask = (1L << bandBits) - 1
    val keys = (0 until bits / bandBits).flatMap { b =>
      val base = shiftright(sig, b * bandBits).bitwiseAND(lit(mask))
      val tag = lit((b + 1).toLong << 60)
      base.bitwiseOR(tag) +: (0 until bandBits).map { fl =>
        base.bitwiseXOR(lit(1L << fl)).bitwiseOR(tag)
      }
    }
    array_distinct(array(keys: _*))
  }

  /** Approximate top-k by cosine via LSH bucketing with query-side
    * multi-probe, exact re-ranking inside candidate buckets, and a
    * brute-force fallback for queries that did not reach k candidates
    * (the fallback keeps the result total).
    */
  def lshTopK(queries: DataFrame, data: DataFrame,
              qVec: String, dVec: String, qId: String, dId: String,
              k: Int, dim: Int, bits: Int = 16, bandBits: Int = 4,
              simCol: String = "cosine"): DataFrame = {
    val w = Window.partitionBy(qId).orderBy(col(simCol).desc, col(dId))
    val dBanded = Dedup.spreadSmallInput(data).withColumn("__band",
      explode(lshBands(lshSignature(col(dVec), dim, bits), bits, bandBits)))
    val qBanded = queries.withColumn("__band",
      explode(lshProbeBands(lshSignature(col(qVec), dim, bits), bits, bandBits)))
    val cand = qBanded.join(dBanded, "__band")
      .drop("__band")
      .distinct()
      .withColumn(simCol, cosine(col(qVec), col(dVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val counts = cand.groupBy(qId).count()
    val starved = queries.join(counts.filter(col("count") >= k).select(qId),
      Seq(qId), "left_anti")
    if (starved.isEmpty) cand
    else cand.join(starved.select(qId), Seq(qId), "left_anti")
      .unionByName(bruteForceTopK(starved, data, qVec, dVec, qId, dId, k, simCol))
  }
}
