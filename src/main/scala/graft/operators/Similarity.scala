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
    requireDisjoint(queries, data, qVec, dVec, qId, dId)
    val w = Window.partitionBy(qId).orderBy(col(simCol).desc, col(dId))
    queries.crossJoin(data)
      .withColumn(simCol, cosine(col(qVec), col(dVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component (splitmix64 ->
    * [-1, 1)).
    */
  def hyperplane(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val m = graft.sources.ImageTable.mix(seed.toLong * 131071 + i)
      (m >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products
    * with fixed deterministic hyperplanes, packed into a Long.
    * Compiles to ONE static call (SimilarityKernels.lshSignature) —
    * the equivalent builtin-composed form (bits x aggregate/zip_with
    * over dim-element literal arrays) codegens to an enormous class
    * that dominates job compile time; the kernel computes the same
    * left-fold double arithmetic bit-for-bit. Accepts array<float>
    * (cast element-wise to double — exact, so signatures are
    * unchanged) or array<double> (passes through at full precision;
    * the earlier float-typed kernel could flip near-zero sign bits
    * for double-typed callers).
    */
  def lshSignature(vec: Column, dim: Int, bits: Int = 16): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.SimilarityKernels"),
      org.apache.spark.sql.types.LongType, "lshSignature",
      Seq(vec, lit(dim), lit(bits)),
      Seq(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.IntegerType))

  /** Band keys over the LSH signature (bandBits-sized chunks). Equal
    * band key => candidate pair.
    */
  def lshBands(sig: Column, bits: Int = 16, bandBits: Int = 4): Column = {
    val mask = (1L << bandBits) - 1
    array((0 until bits / bandBits).map { b =>
      // tag with band index so different bands never collide; the tag
      // sits just ABOVE the slice bits ((b+1) << bandBits), so it
      // cannot wrap for any realistic band count — a fixed high-bit
      // tag ((b+1) << 60) silently wrapped to 0 at band 16 and
      // aliased bands 17+ onto bands 1+, cross-colliding buckets
      shiftright(sig, b * bandBits).bitwiseAND(lit(mask))
        .bitwiseOR(lit((b + 1).toLong << bandBits))
    }: _*)
  }

  /** Deterministically cap band-bucket size (order by id): buckets
    * beyond `maxBucket` rows would make the bucket self-join
    * quadratic on pathological corpora (boilerplate floods); capped
    * members still pair through their other bands. The window sorts
    * within the same shuffle the bucket join needs anyway.
    */
  private[operators] def capBuckets(banded: DataFrame, idCol: String,
                                    maxBucket: Int): DataFrame = {
    val wB = Window.partitionBy("__band").orderBy(col(idCol))
    banded.withColumn("__rn", row_number().over(wB))
      .filter(col("__rn") <= maxBucket).drop("__rn")
  }

  /** Candidate (id_a, id_b) pairs (id_a < id_b) from a (band, id)
    * frame: bucket self-join carrying IDS ONLY — payloads (vectors /
    * signatures) are attached after the distinct, so a pair colliding
    * in several bands never shuffles its payload more than once.
    */
  private[operators] def bandPairs(banded: DataFrame, idCol: String,
                                   maxBucket: Int): DataFrame = {
    val capped = capBuckets(banded, idCol, maxBucket)
    capped.select(col("__band"), col(idCol).as("id_a"))
      .join(capped.select(col("__band"), col(idCol).as("id_b")), "__band")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket
    * self-join then exact cosine filter — the embedding analogue of
    * MinHash text dedup (pairs are candidates only when they share a
    * signature band, so candidate volume stays linear for
    * non-degenerate data). Pair candidates travel as ids only;
    * vectors join back once after dedup. Returns (id_a, id_b,
    * cosine), id_a < id_b.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        bits: Int = 16, bandBits: Int = 8,
                        maxBucket: Int = 4096): DataFrame = {
    val vecs = Dedup.spreadSmallInput(df)
      .select(col(idCol).as("__id"), col(vecCol).as("__vec"))
    val banded = vecs.withColumn("__band",
      explode(lshBands(lshSignature(col("__vec"), dim, bits), bits, bandBits)))
      .select("__band", "__id")
    bandPairs(banded, "__id", maxBucket)
      .join(vecs.select(col("__id").as("id_a"), col("__vec").as("__vec_a")), "id_a")
      .join(vecs.select(col("__id").as("id_b"), col("__vec").as("__vec_b")), "id_b")
      .withColumn("cosine", cosine(col("__vec_a"), col("__vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic pseudo-random centroids (for gates/benches that
    * need the IVF SEARCH path without data-dependent training).
    */
  def pseudoCentroids(nCentroids: Int, dim: Int, seed: Int = 1000): Array[Double] =
    Array.tabulate(nCentroids)(c => hyperplane(seed + c, dim)).flatten

  /** Bounded last-resort candidates for starved queries: per-partition
    * local top-k over the data (one column-pruned linear pass), merged
    * as (numPartitions x k) id pairs per query — never a
    * |starved| x |data| frame through a global window (whose one
    * row_number sort per query would be unbounded in |data|). The
    * local ordering uses bit-identical arithmetic to the Column
    * [[cosine]] (sequential left-fold of double products), so the
    * local top-k provably contains the global top-k under the final
    * exact re-rank.
    */
  /** @param onChunk called with each chunk's PERSISTED result frame —
    *   the caller owns their release (Dataset.persist entries are
    *   held by CacheManager until an explicit unpersist; nothing is
    *   reclaimed automatically). [[escalatedTopK]] registers them in
    *   its try/finally alongside its other pinned intermediates.
    */
  private[operators] def localTopKPairs(starved: DataFrame, data: DataFrame,
                                        dVec: String, dId: String, k: Int,
                                        chunkSize: Int = 10000,
                                        onChunk: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = data.sparkSession
    require(chunkSize >= 1, s"chunkSize must be >= 1 (got $chunkSize)")
    val dFull = data.select(col(dId).as("__did"), col(dVec).as("__dvec"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__qid", starved.schema("__qid").dataType),
      org.apache.spark.sql.types.StructField("__did", dFull.schema("__did").dataType)))
    // CHUNKED driver pull: |starved| is unbounded in principle (a
    // pathological embedding distribution can starve every query), so
    // a single collect() of all starved vectors could OOM the driver.
    // toLocalIterator streams one partition at a time; each pass
    // broadcasts at most `chunkSize` vectors (~5 MB at dim 64),
    // materializes its (disk-backed) result EAGERLY, and then drops
    // the broadcast's cluster-executor copies (a local[N] no-op —
    // see localTopKChunk) — so per-pass work and cluster broadcast
    // residency are chunk-bounded, at the cost of one data scan per
    // chunk (inherent to a bounded last-resort path). Honest
    // remaining bound: the driver retains one qVecs array per chunk
    // through each RDD's closure (one copy of every starved vector
    // in total — half the old collect+broadcast double copy), and
    // each chunk's persisted frame lives until the CALLER unpersists
    // it via `onChunk` registration — CacheManager never reclaims
    // persist entries on its own. The union is built as a balanced
    // tree so |starved|/chunkSize chunks cost log-depth analysis,
    // not a left-deep recursion.
    val starvedRows = starved.select("__qid", "__qvec").toLocalIterator()
    var parts: List[DataFrame] = Nil
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    def flush(): Unit = if (buf.nonEmpty) {
      val part = localTopKChunk(buf.toArray, dFull, outSchema, k)
      onChunk(part)
      parts ::= part
      buf.clear()
    }
    while (starvedRows.hasNext) {
      buf += starvedRows.next()
      if (buf.size >= chunkSize) flush()
    }
    flush()
    @scala.annotation.tailrec
    def unionBalanced(dfs: List[DataFrame]): DataFrame = dfs match {
      case single :: Nil => single
      case _ => unionBalanced(dfs.grouped(2).map {
        case a :: b :: Nil => a.unionByName(b)
        case single => single.head
      }.toList)
    }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else unionBalanced(parts)
  }

  /** One bounded pass of [[localTopKPairs]]: per-partition heap scan
    * of the data against <= chunkSize broadcast query vectors.
    */
  private def localTopKChunk(rows: Array[org.apache.spark.sql.Row],
                             dFull: DataFrame,
                             outSchema: org.apache.spark.sql.types.StructType,
                             k: Int): DataFrame = {
    val spark = dFull.sparkSession
    def toDoubles(s: Seq[Any]): Array[Double] =
      s.iterator.map(x => x.asInstanceOf[Number].doubleValue()).toArray
    val qVecs: Array[(Any, Array[Double])] =
      rows.map(r => (r.get(0), toDoubles(r.getSeq[Any](1))))
    val bc = spark.sparkContext.broadcast(qVecs)
    def cmpId(x: Any, y: Any): Int = x.asInstanceOf[Comparable[Any]].compareTo(y)
    // max-heap whose head is the WORST kept candidate: smaller cosine
    // (ties: larger id) ranks greater — same total order, negated, as
    // the final row_number(orderBy(sim desc, id asc))
    val worseIsGreater: Ordering[(Double, Any)] = new Ordering[(Double, Any)] {
      def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else cmpId(a._2, b._2)
      }
    }
    val pairRdd = dFull.rdd.mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Any)]()(worseIsGreater))
      it.foreach { r =>
        val did = r.get(0)
        val dv = toDoubles(r.getSeq[Any](1))
        var qi = 0
        while (qi < qs.length) {
          val qv = qs(qi)._2
          val n = math.min(qv.length, dv.length)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            dot += qv(i) * dv(i); na += qv(i) * qv(i); nb += dv(i) * dv(i)
            i += 1
          }
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          val h = heaps(qi)
          if (h.size < k) h.enqueue((sim, did))
          else if (worseIsGreater.compare((sim, did), h.head) < 0) {
            h.dequeue(); h.enqueue((sim, did))
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map(e => org.apache.spark.sql.Row(qs(qi)._1, e._2))
      }
    }
    // materialize NOW (disk-backed) so chunk scans run one at a time
    // instead of piling into the caller's first action, then release
    // the broadcast's remote copies. The unpersist only frees blocks
    // on CLUSTER executors (local[N]'s single driver block manager is
    // skipped by removeBroadcast) — in local mode the win is the
    // serialized scans; an evicted partition re-broadcasts from the
    // driver-retained value automatically, so this is safe either way
    val out = spark.createDataFrame(pairRdd, outSchema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    bc.unpersist(blocking = false)
    out
  }

  /** Shared starvation-escalation scaffold for the approximate top-k
    * operators: run candidate `stages` in order (stage 0 over all
    * queries, later stages only over still-starved ones) until every
    * query has >= k candidate (id, id) pairs, falling back to the
    * bounded [[localTopKPairs]] scan for any residual queries; then
    * join vectors back once and rank exactly. Id-pair stages persist
    * MEMORY_AND_DISK and release after the result materializes. The
    * returned result stays persisted so the caller's action reads the
    * materialized rows; it is reclaimed by Spark's ContextCleaner once
    * the caller drops the reference (or sooner via an explicit
    * unpersist).
    *
    * Contract: `qS` has columns (__qid, __qvec); stages map a frame
    * with those columns to (__qid, __did) pairs.
    */
  /** The top-k operators REFERENCE the vec/id columns after joining
    * query and data into one frame, so those four names must be
    * unambiguous: fail fast with the remedy instead of an
    * AnalysisException deep in the final re-rank plan (self-kNN:
    * rename one side first, e.g.
    * `data.toDF(data.columns.map("d_" + _): _*)`). Unreferenced
    * passenger columns MAY share names — the output then simply
    * carries duplicates, as any Spark join does.
    */
  private def requireDisjoint(queries: DataFrame, data: DataFrame,
                              qVec: String, dVec: String,
                              qId: String, dId: String): Unit = {
    val referenced = Set(qVec, dVec, qId, dId)
    val overlap = (queries.columns.toSet intersect data.columns.toSet)
      .intersect(referenced)
    require(overlap.isEmpty,
      s"queries and data share referenced column names ${overlap.mkString(", ")}; " +
        "rename one side before calling (self-kNN: " +
        "data.toDF(data.columns.map(\"d_\" + _): _*))")
  }

  private def escalatedTopK(queries: DataFrame, data: DataFrame,
                            qVec: String, dVec: String, qId: String, dId: String,
                            k: Int, simCol: String,
                            qS: DataFrame,
                            stages: Seq[DataFrame => DataFrame],
                            opName: String): DataFrame = {
    requireDisjoint(queries, data, qVec, dVec, qId, dId)
    val w = Window.partitionBy(qId).orderBy(col(simCol).desc, col(dId))
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += p
      p
    }
    def starvedAfter(pairs: DataFrame): DataFrame =
      qS.join(pairs.groupBy("__qid").count().filter(col("count") >= k)
        .select("__qid"), Seq("__qid"), "left_anti")
    // try/finally: a failed stage job must still release the pinned
    // intermediates — on the success path the finally releases them
    // only after result.count() has materialized the output
    try {
      var pairs = hold(stages.head(qS))
      var starved = hold(starvedAfter(pairs))
      for (stage <- stages.tail if !starved.isEmpty) {
        pairs = hold(pairs.unionByName(stage(starved)).distinct())
        starved = hold(starvedAfter(pairs))
      }
      if (!starved.isEmpty) {
        val n = starved.count()
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$opName: $n queries starved after escalation; " +
            "running the bounded per-partition local top-k scan for them")
        pairs = hold(pairs.unionByName(
          localTopKPairs(starved, data, dVec, dId, k,
            onChunk = persisted += _)).distinct())
      }
      val result = pairs
        .join(queries.withColumnRenamed(qId, "__qid"), "__qid")
        .join(data.withColumnRenamed(dId, "__did"), "__did")
        .withColumnRenamed("__qid", qId).withColumnRenamed("__did", dId)
        .withColumn(simCol, cosine(col(qVec), col(dVec)))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      result.count() // materialize before releasing the id-pair stages
      result
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** Train IVF coarse centroids with Lloyd iterations executed as
    * Spark aggregations (assignment via [[SimilarityKernels.ivfAssign]],
    * per-cluster component means via groupBy — map-side partial
    * aggregation, so each iteration is one pass over the data).
    * Deterministic: initial centroids are the rows with the lowest
    * xxhash64(id). Returns nCentroids x dim, row-major flat; empty
    * clusters keep their previous centroid.
    */
  /** @param trainSampleCap Lloyd iterations train on a bounded
    *   deterministic [[Sampling.hashSample]] once the corpus exceeds
    *   this many rows (at 100 TB nobody k-means the whole corpus —
    *   centroid quality converges long before millions of training
    *   rows, and each Lloyd iteration is otherwise a full-corpus
    *   pass). Assignment/probing always run over the FULL corpus with
    *   the trained centroids. Corpora at or under the cap train
    *   exactly as before (the oracle-mirrored gates live there);
    *   pass Long.MaxValue to force full-corpus training.
    */
  def ivfTrain(data: DataFrame, vecCol: String, idCol: String, dim: Int,
               nCentroids: Int, iters: Int = 4,
               trainSampleCap: Long = 1000000L): Array[Double] = {
    val spark = data.sparkSession
    require(trainSampleCap >= math.max(1L, nCentroids.toLong),
      s"trainSampleCap=$trainSampleCap cannot seed $nCentroids centroids")
    val total = data.count()
    val train =
      if (total <= trainSampleCap) data
      else {
        // oversample by 10% so hash jitter cannot undercut the seed
        // requirement; determinism rides the md5 hash, not partitioning
        val frac = math.min(1.0, 1.1 * trainSampleCap.toDouble / total.toDouble)
        Sampling.hashSample(data, idCol, frac, salt = "ivf-train")
      }
    var centroids: Array[Double] = train
      .select(col(idCol), col(vecCol))
      .withColumn("__h", xxhash64(col(idCol)))
      // secondary key: duplicate ids (or 64-bit hash collisions) must
      // not leave the seed choice to task order — determinism is part
      // of the contract the oracle mirrors rely on
      .orderBy(col("__h"), col(idCol)).limit(nCentroids)
      .select(col(vecCol)).collect()
      // element-type-agnostic: vectors may be array<float> OR
      // array<double> (both in-contract, see lshSignature)
      .flatMap(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue()))
    require(centroids.length == nCentroids * dim,
      s"need >= $nCentroids rows of dim-$dim vectors to train IVF")
    for (_ <- 1 to iters) {
      val assigned = train.select(col(vecCol).as("__v"))
        .withColumn("__c", ivfAssign(col("__v"), centroids, dim))
        .withColumn("__d", transform(col("__v"), x => x.cast("double")))
      val means = assigned.groupBy("__c")
        .agg(array((0 until dim).map(i => avg(col("__d").getItem(i))): _*).as("__m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      val next = centroids.clone()
      means.foreach { case (c, m) => System.arraycopy(m, 0, next, c * dim, dim) }
      centroids = next
    }
    centroids
  }

  /** Nearest-centroid id of a vector (centroids ride along as ONE
    * array literal in the plan — cluster-correct, no driver-side
    * statics).
    */
  def ivfAssign(vec: Column, centroidsFlat: Array[Double], dim: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.SimilarityKernels"),
      org.apache.spark.sql.types.IntegerType, "ivfAssign",
      Seq(vec, lit(centroidsFlat), lit(dim)),
      Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.IntegerType))

  /** The `nProbe` nearest centroid ids of a vector (query side). */
  def ivfProbes(vec: Column, centroidsFlat: Array[Double], dim: Int,
                nProbe: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.SimilarityKernels"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false),
      "ivfProbes",
      Seq(vec, lit(centroidsFlat), lit(dim), lit(nProbe)),
      Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.IntegerType))

  /** IVF approximate top-k by cosine: data partitioned into coarse
    * centroid lists (one equi-join key per row), queries probe their
    * `nProbe` nearest lists, exact cosine re-rank inside the probed
    * lists. The second ANN scale path next to [[lshTopK]] — better
    * for clustered corpora, where hyperplane bands split dense
    * clusters. Queries that still lack k candidates widen to all
    * lists (one linear id scan for a residual query set, never a
    * quadratic join).
    */
  def ivfTopK(queries: DataFrame, data: DataFrame,
              qVec: String, dVec: String, qId: String, dId: String,
              k: Int, dim: Int, centroidsFlat: Array[Double],
              nProbe: Int = 4, simCol: String = "cosine"): DataFrame = {
    val nCentroids = centroidsFlat.length / dim
    // one assignment pass, persisted across the up-to-three escalation
    // stages that probe it (they previously each re-ran the kernel
    // assignment over the full data set)
    val dLists = data.select(col(dId).as("__did"), col(dVec).as("__dvec"))
      .withColumn("__list", ivfAssign(col("__dvec"), centroidsFlat, dim))
      .select("__list", "__did")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qS = queries.select(col(qId).as("__qid"), col(qVec).as("__qvec"))
    def pairsOf(probes: Int)(qs: DataFrame): DataFrame =
      qs.select(col("__qid"),
          explode(ivfProbes(col("__qvec"), centroidsFlat, dim, probes)).as("__list"))
        .join(dLists, "__list")
        .select("__qid", "__did").distinct()
    try escalatedTopK(queries, data, qVec, dVec, qId, dId, k, simCol, qS,
      Seq(pairsOf(nProbe) _, pairsOf(math.min(nCentroids, nProbe * 4)) _,
        pairsOf(nCentroids) _),
      "ivfTopK")
    finally dLists.unpersist(blocking = false)
  }

  /** Query-side multi-probe band keys: each band's exact key plus its
    * hamming-1 (and, for radius 2, hamming-2) variants — near-miss
    * sign flips on single hyperplanes stop costing candidates
    * (standard multi-probe LSH).
    */
  def lshProbeBands(sig: Column, bits: Int = 16, bandBits: Int = 4,
                    radius: Int = 1): Column = {
    val mask = (1L << bandBits) - 1
    val flips: Seq[Long] = {
      val h1 = (0 until bandBits).map(1L << _)
      val h2 =
        if (radius >= 2)
          for { a <- 0 until bandBits; b <- a + 1 until bandBits }
            yield (1L << a) | (1L << b)
        else Seq.empty
      0L +: (h1 ++ h2)
    }
    val keys = (0 until bits / bandBits).flatMap { b =>
      val base = shiftright(sig, b * bandBits).bitwiseAND(lit(mask))
      val tag = lit((b + 1).toLong << bandBits) // see lshBands tag note
      flips.map(f => base.bitwiseXOR(lit(f)).bitwiseOR(tag))
    }
    array_distinct(array(keys: _*))
  }

  /** Approximate top-k by cosine via LSH bucketing with query-side
    * multi-probe and exact re-ranking inside candidate buckets.
    *
    * Queries that do not reach k candidates ESCALATE instead of
    * falling straight to brute force: first hamming-2 multi-probe,
    * then re-bucketing both sides at half the band width (higher
    * collision probability); only queries still starved after both —
    * vanishingly rare, logged — take all data ids, which is one
    * column-pruned linear pass over the data for a residual query
    * set, never a quadratic join. Candidate pairs travel as ids only;
    * vectors are joined back once for the final exact re-rank.
    *
    * `maxBucket` (default 4096) caps each data-side band bucket
    * deterministically (lowest ids kept) so a degenerate corpus — a
    * boilerplate flood sharing one signature — cannot make the bucket
    * self-join quadratic. The cap COSTS RECALL on such corpora: a
    * query that already has >= k candidates is never rescued by
    * escalation, so true neighbors that were capped out of a
    * >maxBucket-member bucket (and collide in no other band) are
    * lost to it. Pass `maxBucket = Int.MaxValue` to restore uncapped
    * candidate generation (pre-cap behavior) when the corpus is known
    * to be flood-free and exact LSH recall matters more than the
    * worst-case bound.
    */
  def lshTopK(queries: DataFrame, data: DataFrame,
              qVec: String, dVec: String, qId: String, dId: String,
              k: Int, dim: Int, bits: Int = 16, bandBits: Int = 4,
              maxBucket: Int = 4096, simCol: String = "cosine"): DataFrame = {
    val dS = Dedup.spreadSmallInput(data)
      .select(col(dId).as("__did"), col(dVec).as("__dvec"))
    val qS = queries.select(col(qId).as("__qid"), col(qVec).as("__qvec"))

    // each band width's data-side frame is built ONCE, capped, and
    // persisted across the escalation stages that share it (stage 2
    // previously re-scanned and re-signatured the whole data set to
    // rebuild the identical frame). The cap bounds boilerplate-flood
    // buckets exactly like embeddingNearDups' capBuckets: a cluster
    // of identical vectors shares every band key, and an uncapped
    // bucket self-join there is quadratic. RECALL CAVEAT (see the
    // scaladoc): escalation only rescues STARVED queries, so for a
    // NON-starved query whose true neighbors sit beyond position
    // `maxBucket` of a hot bucket, those neighbors are simply not
    // candidates — the cap trades bounded recall loss on degenerate
    // buckets for a hard quadratic-blowup guarantee.
    val bandCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def dBands(bb: Int): DataFrame = bandCache.getOrElseUpdate(bb,
      capBuckets(dS.select(col("__did"),
          explode(lshBands(lshSignature(col("__dvec"), dim, bits), bits, bb))
            .as("__band")),
        "__did", maxBucket)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def pairsOf(bb: Int, radius: Int)(qs: DataFrame): DataFrame =
      qs.select(col("__qid"),
          explode(lshProbeBands(lshSignature(col("__qvec"), dim, bits), bits, bb, radius))
            .as("__band"))
        .join(dBands(bb), "__band")
        .select("__qid", "__did").distinct()

    // escalation ladder: exact+hamming-1 probes, then hamming-2, then
    // half-width re-banding (higher collision probability)
    try escalatedTopK(queries, data, qVec, dVec, qId, dId, k, simCol, qS,
      Seq(pairsOf(bandBits, 1) _, pairsOf(bandBits, 2) _,
        pairsOf(math.max(2, bandBits / 2), 1) _),
      "lshTopK")
    finally bandCache.values.foreach(_.unpersist(blocking = false))
  }
}
