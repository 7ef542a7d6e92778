package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "completely different content about spark query engines and joins"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "der schnelle braune fuchs springt und das ist nicht genug heute")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per duplicate text") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 5L)) // row 4 is an exact dup of 1
  }

  test("minhash LSH finds near-duplicate pairs only") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 4L)), s"exact dup pair missing: ${keys.mkString(",")}")
    assert(keys.contains((1L, 2L)) || keys.contains((2L, 4L)),
      s"near dup pair missing: ${keys.mkString(",")}")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc matched")
    pairs.filter(p => (p._1, p._2) == (1L, 4L)).foreach(p => assert(p._3 == 1.0))
  }

  test("simhash hamming tracks similarity") {
    val sigs = docs.withColumn("sig", Dedup.simHash(col("text")))
      .select("doc_id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1, 4) == 0)
    assert(ham(1, 2) < ham(1, 3), s"near=${ham(1, 2)} far=${ham(1, 3)}")
    assert(ham(1, 2) <= 12)
  }

  test("fused md5 simhash/fingerprint kernels equal their expression forms") {
    // the fused kernels must stay value-identical to the builtin
    // expression chains the DuckDB oracle mirrors relationally —
    // cover the edge shapes: shorter than k, shorter than a
    // fingerprint window, exactly one window, beyond the shingle cap
    val edge = (docs.select("text") union Seq(
      "", "a", "abc", "exactly8", "ninechars",
      "x" * 5000 + " tail beyond the shingle cap",
      "MiXeD CaSe LoWeRiNg ChEcK 123",
      // non-BMP code points (surrogate pairs in UTF-16): shingle
      // indexing must count code points like Spark substring does
      "rocket 🚀 and globe 🌍 mixed in",
      "🚀🌍🔥éü ascii tail",
      // U+0130: lowercasing EXPANDS it to two code points, so the
      // shingle count must come from the pre-lowercase length (the
      // expression form's sequence bound) or every shingle shifts
      "İstanbul İİ text"
    ).toDF("text")).withColumnRenamed("text", "t")
    val cmp = edge.select(
      Dedup.simHashMd5(col("t")).as("k_sig"),
      Dedup.simHashFromHashes(transform(Dedup.shingles(col("t")),
        x => Dedup.hash60md5(x))).as("e_sig"),
      TextAnalysis.fingerprint(col("t"), basis = "md5").as("k_fp"),
      when(length(col("t")) < 8, Dedup.hash60md5(col("t")))
        .otherwise(array_min(slice(transform(
          sequence(lit(0), greatest(floor((length(col("t")) - 8) / 4).cast("int"), lit(0))),
          i => Dedup.hash60md5(substring(col("t"), i * 4 + 1, lit(8)))), 1, 512)))
        .as("e_fp")
    ).collect()
    cmp.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"simhash kernel != expression: $r")
      assert(r.getLong(2) == r.getLong(3), s"fingerprint kernel != expression: $r")
    }
  }

  test("ngram jaccard") {
    val out = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.ngramJaccard(col("a.text"), col("b.text")).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 4L)) == 1.0)
    assert(out((1L, 2L)) > 0.5 && out((1L, 2L)) < 1.0)
    assert(out((1L, 3L)) == 0.0)
  }

  test("ngram jaccard kernel equals the expression form") {
    val cmp = docs.as("a").crossJoin(docs.as("b")).select(
      Dedup.ngramJaccard(col("a.text"), col("b.text")).as("e"),
      Dedup.ngramJaccardFast(col("a.text"), col("b.text")).as("k"),
      Dedup.ngramJaccard(col("a.text"), col("b.text"), n = 2).as("e2"),
      Dedup.ngramJaccardFast(col("a.text"), col("b.text"), n = 2).as("k2"))
      .collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"n=3: $r")
      assert(r.getDouble(2) == r.getDouble(3), s"n=2: $r")
    }
    // null propagation matches too (kernel via propagateNull)
    val nn = docs.select(
      Dedup.ngramJaccardFast(col("text"), lit(null).cast("string"))).collect()
    assert(nn.forall(_.isNullAt(0)))
  }

  test("ngram jaccard propagates null text as null, not 0") {
    val r = docs.select(
      Dedup.ngramJaccard(col("text"), lit(null).cast("string")).as("jn"),
      Dedup.ngramJaccard(col("text"), col("text")).as("js")).collect()
    assert(r.forall(_.isNullAt(0)))
    assert(r.forall(_.getDouble(1) == 1.0))
  }

  test("text analysis basics") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.wordCount(col("text")).as("wc"),
      TextAnalysis.langGuess(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.tokenCountApprox(col("text")).as("tok"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(r(1L).getInt(1) == 13)
    assert(r(1L).getString(2) == "en")
    assert(r(5L).getString(2) == "de")
    assert(r(1L).getDouble(3) > 0 && r(1L).getDouble(3) <= 1)
    assert(r(1L).getInt(4) >= 13)
    assert(r(1L).getLong(5) == r(4L).getLong(5)) // equal text, equal fingerprint
    assert(r(1L).getLong(5) != r(3L).getLong(5))
  }

  test("embedding near-dup pairs find planted duplicates") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant near-duplicates: copies of vecs 0..4 with tiny jitter
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * 1.001f).as("embedding"))
    val all = emb.select("vec_id", "embedding").unionByName(planted)
    val pairs = Similarity.embeddingNearDups(all, "vec_id", "embedding",
      dim = 64, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((i, i + 10000)), s"planted dup $i missing: $pairs")
    }
  }

  test("pathological corpus: 10k identical docs stay linear (star-encoded)") {
    val flood = spark.range(10000)
      .select(col("id").as("doc_id"),
        lit("exactly the same boilerplate text repeated across the corpus").as("text"))
    val pairs = Dedup.minHashPairs(flood, "doc_id", "text", threshold = 0.5)
    val rows = pairs.collect()
    // star encoding: one (rep=0, member) pair per duplicate, not the
    // ~5e7-pair clique; clusters (connected components) are identical
    assert(rows.length == 9999)
    assert(rows.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
  }

  test("near-identical flood: capped buckets keep the pair join bounded") {
    // 2000 distinct-but-similar docs share most bands; with a 64-row
    // bucket cap the self-join stays bounded and still completes
    val docsBig = spark.range(2000)
      .select(col("id").as("doc_id"),
        concat(lit("shared boilerplate header that dominates every document in this set variant "),
          col("id").cast("string")).as("text"))
    val pairs = Dedup.minHashPairs(docsBig, "doc_id", "text",
      threshold = 0.35, maxBucket = 64)
    val n = pairs.count()
    // every emitted pair from a capped bucket is <= C(64,2) per band x 8 bands
    assert(n > 0 && n <= 8L * 64 * 63 / 2)
  }

  test("hamming near-dup join equals brute force (multi-index hashing)") {
    val rnd = new scala.util.Random(42)
    val base = (0 until 200).map(i => (i.toLong, rnd.nextLong()))
    // planted near-dups: flip 0..3 bits of every 5th fingerprint
    // (0 flips exercises the identical-fingerprint star path)
    val planted = (0 until 40).map { j =>
      val fp = base(j * 5)._2
      val flips = rnd.nextInt(4)
      val mutated = (0 until flips).foldLeft(fp)((f, _) => f ^ (1L << rnd.nextInt(64)))
      (1000L + j, mutated)
    }
    val all = base ++ planted
    val got = Dedup.hammingNearDups(all.toDF("id", "fp"), "id", "fp",
        maxDist = 3, bits = 64, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // expected under the documented contract: identical fingerprints
    // star to the min-id representative; representatives pair exactly
    val rep = all.groupBy(_._2).map { case (fp, rows) => fp -> rows.map(_._1).min }
    val stars = all.filter { case (id, fp) => rep(fp) != id }
      .map { case (id, fp) => (rep(fp), id, 0) }.toSet
    val reps = all.filter { case (id, fp) => rep(fp) == id }
    val brute = (for {
      (a, fa) <- reps; (b, fb) <- reps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "test data must contain representative-level near-dups")
    assert(got == brute ++ stars,
      s"missing=${(brute ++ stars) -- got} extra=${got -- (brute ++ stars)}")
  }

  test("null fingerprints never pair (no null clique, nulls survive resolve)") {
    // 3 null-fp docs (e.g. simhash of null text) + one real dup pair:
    // nulls must emit NO pairs — the old __fp window cliqued them and
    // the resolve step then silently dropped all but one null-text doc
    val rows = Seq((1L, Some(7L)), (2L, Some(7L)), (10L, None),
        (11L, None), (12L, None))
      .toDF("id", "fp")
    val pairs = Dedup.hammingNearDups(rows, "id", "fp", maxDist = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), s"got ${pairs.toSet}")
    val kept = Dedup.keepComponentRepresentatives(
        rows, "id",
        Dedup.hammingNearDups(rows, "id", "fp", maxDist = 2, bands = 4)
          .select("id_a", "id_b"), "id_a", "id_b")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 11L, 12L))
  }

  test("jointNearDups requires BOTH fingerprint and caption nearness") {
    val rows = Seq(
      // fp-near AND caption-near -> emitted
      (1L, 0x0FL, "the quick brown fox jumps over the lazy dog"),
      (2L, 0x0EL, "the quick brown fox jumps over the lazy cat"),
      // fp-near but caption-far -> rejected by the jaccard verify
      (3L, 0xF0L, "completely different words about sailing ships"),
      (4L, 0xF1L, "unrelated sentence concerning mountain weather patterns"),
      // caption-identical but fp-far -> never a candidate
      (5L, 0x0FL ^ -1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "fp", "cap")
    val got = Dedup.jointNearDups(rows, "id", "fp", "cap",
        maxDist = 3, minJaccard = 0.5, bits = 64, bands = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("identical-fingerprint flood stays linear in hamming near-dup join") {
    val flood = spark.range(3000)
      .select(col("id"), lit(0x1234L).as("fp"))
      .union(Seq((9000L, 0x1235L)).toDF("id", "fp"))
    val out = Dedup.hammingNearDups(flood, "id", "fp", maxDist = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 2999 star pairs around rep 0, plus (0, 9000) at distance 1 —
    // never the ~4.5M-pair clique
    assert(out.length == 3000)
    assert(out.count(_._3 == 0) == 2999)
    assert(out.contains((0L, 9000L, 1)))
  }

  test("connected components equal union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // sparse random graph + a long chain (exercises multi-round
    // propagation) + isolated self-contained pairs
    val edges = ((0 until 150).map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      ++ (500L until 540L).map(i => (i, i + 1))
      ++ Seq((900L, 901L))).filter(e => e._1 != e._2)
    val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the DISTRIBUTED pointer-doubling path (threshold 0) —
    // both paths must produce the identical labelling
    val gotDist = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b",
        localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gotDist)
    // reference union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(got == want)
  }

  test("null ids never crash component resolution and are not nodes") {
    import spark.implicits._
    val pairs = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (null, null), (5L, null), (null, 7L)).toDF("a", "b")
    // local fast path
    val local = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distributed path (threshold 0) — must agree: null is not a
    // node, and the non-null half of a half-null pair is isolated
    val dist = Dedup.connectedComponents(pairs, "a", "b",
        localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L)
    assert(local === want)
    assert(dist === want)
  }

  test("keepComponentRepresentatives keeps one row per near-dup cluster") {
    import spark.implicits._
    // real pipeline shape: minhash pairs over a corpus with planted
    // near-dup chains -> component keepers
    // truly distinct texts (hash-derived word soup — shared prefixes
    // would be legitimate near-dups to a shingle jaccard)
    val rnd7 = new scala.util.Random(11)
    val docs = ((0 until 30).map(i => (i.toLong,
        Seq.fill(12)(java.lang.Long.toString(rnd7.nextLong() & 0x7fffffffL, 36)).mkString(" ")))
      ++ Seq((100L, "aaaa bbbb cccc dddd eeee"), (101L, "aaaa bbbb cccc dddd eeee"),
             (102L, "aaaa bbbb cccc dddd eeee ffff"))).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.3)
    val kept = Dedup.keepComponentRepresentatives(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 100/101 identical, 102 near-dup of them => one keeper (100);
    // every unique doc survives
    assert(kept.contains(100L) && !kept.contains(101L) && !kept.contains(102L))
    assert((0L until 30L).forall(kept.contains))
  }

  test("lshTopK fills starved queries via escalation (exact k per query)") {
    import spark.implicits._
    // orthogonal-ish sparse data: queries far from everything starve at
    // the first banding and must escalate
    def basis(i: Int, s: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i % 64) = s; a(63 - (i % 32)) = -s; a
    }
    val data = (0 until 40).map(i => (i.toLong, basis(i, 1.0f))).toDF("d_id", "d_vec")
    val queries = (0 until 6).map(i => (i.toLong, basis(i * 11 + 3, -2.0f)))
      .toDF("q_id", "q_vec")
    val out = Similarity.lshTopK(queries, data, "q_vec", "d_vec", "q_id", "d_id",
      k = 4, dim = 64)
    val perQuery = out.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQuery.length == 6 && perQuery.forall(_ == 4L))
  }

  test("lshTopK residual starvation takes the bounded local top-k scan") {
    import spark.implicits._
    // all data rows share one vector v; queries are -v, so every band
    // of the query signature is the bitwise complement of the data
    // band: hamming distance 4 per 4-bit band (> radius 2) and 2 per
    // 2-bit half-width band (> radius 1) — every escalation stage
    // yields zero candidates and the bounded local scan must fill k
    val v = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    val nv = v.map(x => -x)
    val data = (0 until 500).map(i => (i.toLong, v)).toDF("d_id", "d_vec")
    val queries = (0 until 5).map(i => (i.toLong, nv)).toDF("q_id", "q_vec")
    val out = Similarity.lshTopK(queries, data, "q_vec", "d_vec", "q_id", "d_id",
      k = 4, dim = 64)
    val rows = out.select("q_id", "rank", "d_id").collect()
    assert(rows.length == 20)
    // all cosines tie at -1, so the exact re-rank breaks ties by d_id:
    // ranks 1..4 must be data ids 0..3 for every query
    rows.foreach(r => assert(r.getLong(2) == r.getInt(1) - 1,
      s"rank ${r.getInt(1)} of query ${r.getLong(0)} is d_id ${r.getLong(2)}"))
  }

  test("localTopKPairs chunks the starved-query collect, result unchanged") {
    import spark.implicits._
    // 53 starved queries with chunkSize 7 => 8 bounded passes; the
    // union of per-pass results must equal the single-pass result and
    // contain the global brute-force top-k ids of every query
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => math.sin(seed * 64.0 + i + 1.0).toFloat)
    val starved = (0 until 53).map(i => (i.toLong, vec(i).map(_.toDouble)))
      .toDF("__qid", "__qvec")
    val data = (0 until 400).map(i => (i.toLong, vec(1000 + i))).toDF("d_id", "d_vec")
    val k = 3
    val held = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    def pairsWith(chunk: Int): Set[(Long, Long)] =
      Similarity.localTopKPairs(starved, data, "d_vec", "d_id", k,
          chunkSize = chunk, onChunk = held += _)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val chunked = pairsWith(7)
    val onePass = pairsWith(100000)
    // chunk frames are persisted; their release is the caller's job
    held.foreach(_.unpersist(blocking = false))
    assert(chunked == onePass, "chunking changed the candidate pair set")
    // local top-k per partition is a superset of the global top-k
    val queries = starved.select(col("__qid").as("q_id"), col("__qvec").as("q_vec"))
    val brute = Similarity.bruteForceTopK(queries, data, "q_vec", "d_vec",
        "q_id", "d_id", k)
      .select("q_id", "d_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(chunked),
      s"missing global top-k pairs: ${(brute -- chunked).take(5)}")
  }

  test("IVF top-k: trained lists, probe recall vs brute force, exact k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val data = emb.select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val centroids = Similarity.ivfTrain(data, "d_vec", "d_id", dim = 64,
      nCentroids = 16, iters = 3)
    assert(centroids.length == 16 * 64)
    val ivf = Similarity.ivfTopK(queries, data, "q_vec", "d_vec", "q_id", "d_id",
      k = 5, dim = 64, centroids, nProbe = 4)
    val iRows = ivf.select("q_id", "d_id", "rank").collect()
    assert(iRows.length == 50, "escalation must fill k for every query")
    // rank 1 of each query is itself (it shares its own list)
    iRows.filter(_.getInt(2) == 1).foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val brute = Similarity.bruteForceTopK(queries, data, "q_vec", "d_vec",
      "q_id", "d_id", 5).select("q_id", "d_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val iSet = iRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & iSet).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")

    // sampled training (the 100 TB path): capping the Lloyd pass at a
    // fraction of the corpus must keep search recall — assignment and
    // probing still cover the FULL corpus
    val n = data.count()
    val sampled = Similarity.ivfTrain(data, "d_vec", "d_id", dim = 64,
      nCentroids = 16, iters = 3, trainSampleCap = n / 3)
    assert(sampled.length == 16 * 64)
    val ivf2 = Similarity.ivfTopK(queries, data, "q_vec", "d_vec", "q_id", "d_id",
      k = 5, dim = 64, sampled, nProbe = 4)
    val i2 = ivf2.select("q_id", "d_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = (brute & i2).size.toDouble / brute.size
    assert(recall2 >= 0.6, s"sample-trained IVF recall too low: $recall2")
  }

  test("embedding similarity: brute force and LSH top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val data = emb.select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(queries, data, "q_vec", "d_vec",
      "q_id", "d_id", 5)
    val bRows = brute.select("q_id", "d_id", "rank").collect()
    assert(bRows.length == 50)
    // rank 1 of each query is itself (cosine 1.0)
    bRows.filter(_.getInt(2) == 1).foreach(r => assert(r.getLong(0) == r.getLong(1)))

    val lsh = Similarity.lshTopK(queries, data, "q_vec", "d_vec",
      "q_id", "d_id", 5, dim = 64)
    val lRows = lsh.select("q_id", "d_id", "rank").collect()
    assert(lRows.length == 50)
    lRows.filter(_.getInt(2) == 1).foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // recall vs brute force
    val bSet = bRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val lSet = lRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bSet & lSet).size.toDouble / bSet.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
  }
}
