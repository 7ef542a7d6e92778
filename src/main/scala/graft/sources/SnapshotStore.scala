package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot/manifest layer over parquet directories
  * (hand-rolled: no Iceberg jar exists in this environment; SURVEY.md
  * §2.10). Layout under `root`:
  *
  * {{{
  *   data/s<N>/<name>/...parquet     immutable data of snapshot N
  *   _snapshots/v<N>.json            snapshot: files, counts, lineage
  *   _snapshots/current              text pointer to latest N
  * }}}
  *
  * Commit protocol: data is written to the snapshot-versioned
  * directory, the snapshot JSON is written, and `current` is replaced
  * by atomic rename — readers only ever follow `current` so a crashed
  * writer leaves at most unreferenced files, never a torn table
  * (same guarantee Iceberg's metadata pointer gives). Re-committing an
  * already-current name+version is a no-op, which is what makes
  * [[getOrCompute]] a resumable checkpoint.
  */
final class SnapshotStore(spark: SparkSession, root: String) {
  private val snapDir = Paths.get(root, "_snapshots")
  Files.createDirectories(snapDir)

  /** Identifies THIS store instance's writes in manifests it commits,
    * so a torn-commit self-heal (same version, same name) can tell
    * "my own crashed attempt" from "a live foreign writer that chose
    * the same name" — the latter is logged loudly instead of silently
    * absorbed. Deliberately NOT used to refuse the overwrite: crash
    * resume re-runs in a NEW process (new id), and refusing would
    * break the exact recovery path the self-heal exists for.
    */
  private val writerId = java.util.UUID.randomUUID().toString

  private def currentPath = snapDir.resolve("current")

  def currentVersion: Option[Int] =
    if (Files.exists(currentPath)) Some(Files.readString(currentPath).trim.toInt)
    else None

  private def snapshotJson(v: Int): Path = snapDir.resolve(s"v$v.json")

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** JSON string-literal body: matches up to the CLOSING quote even
    * when the value contains esc()-escaped quotes/backslashes (a plain
    * `[^"]*` would stop at the first escaped quote).
    */
  private val JsonStr = """(?:[^"\\]|\\.)*"""

  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'u' if i + 5 < s.length =>
          b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
        case e => b.append(e); i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** All committed snapshots: (version, name, rowCount). */
  def snapshots: Seq[(Int, String, Long)] =
    (1 to currentVersion.getOrElse(0)).flatMap { v =>
      val p = snapshotJson(v)
      if (!Files.exists(p)) None
      else {
        val s = Files.readString(p)
        val name = ("\"name\"\\s*:\\s*\"(" + JsonStr + ")\"").r.findFirstMatchIn(s).map(m => unesc(m.group(1)))
        val rows = """"rowCount"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
        Some((v, name.getOrElse(""), rows.getOrElse(0L)))
      }
    }

  /** Latest committed snapshot version carrying `name`, if any. */
  def versionOf(name: String): Option[Int] =
    snapshots.filter(_._2 == name).map(_._1).lastOption

  def dataPath(v: Int, name: String): String =
    Paths.get(root, "data", s"s$v", name).toString

  def read(name: String): DataFrame = {
    val v = versionOf(name).getOrElse(
      throw new IllegalArgumentException(s"no snapshot named '$name' in $root"))
    spark.read.parquet(dataPath(v, name))
  }

  /** Time travel: read `name` as of store version `asOf` — the latest
    * snapshot of that name with version <= asOf (Iceberg
    * snapshot-id-style read; superseded data directories are never
    * deleted, so history stays readable).
    */
  def readAt(name: String, asOf: Int): DataFrame = {
    val v = snapshots.filter(s => s._2 == name && s._1 <= asOf).map(_._1)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        s"no snapshot named '$name' at or before version $asOf in $root"))
    spark.read.parquet(dataPath(v, name))
  }

  /** Write `df` as a new snapshot called `name`: ONE job writes the
    * data files; the manifest (per-file row counts + the write
    * partition each file came from) is then assembled from parquet
    * FOOTERS — a metadata-only read, never a second pass over the
    * data — followed by the atomic `current` pointer flip. The
    * partition index is the one the parquet committer encodes in the
    * part file name, so per-partition lineage costs nothing extra.
    */
  def commit(name: String, df: DataFrame): Int = commit(name, df, None)

  /** Commit with a designated ZONE-MAP column: per-file min/max of
    * `statsCol` (an integral column, e.g. a cell id) are lifted from
    * the SAME parquet footers the manifest already reads — still
    * metadata-only — and recorded per file, so [[readPruned]] can
    * skip whole files by range without listing or opening them. At
    * 100 TB with data clustered by cell (the committed layout the
    * pipeline produces), a tile/AOI-ranged read touches only the
    * overlapping files — Iceberg's data-skipping story without the
    * Iceberg jar.
    */
  def commit(name: String, df: DataFrame, statsCol: Option[String]): Int = {
    val v = currentVersion.getOrElse(0) + 1
    // concurrent-writer detection: two committers on the same root
    // would both allocate version N+1 and silently clobber each
    // other's data + manifest, last pointer flip winning. The store
    // is single-writer by design (one driver owns a root); make a
    // violation loud instead of a silent lost commit. A manifest for
    // v carrying the SAME name is this job's own torn commit (crash
    // between manifest write and pointer flip — streaming replay hits
    // exactly this window) and is safely re-written; a DIFFERENT name
    // means a genuinely foreign writer. (Not a full CAS — a true
    // multi-writer protocol needs an atomic catalog.)
    if (Files.exists(snapshotJson(v))) {
      val torn = Files.readString(snapshotJson(v))
      val tornName = ("\"name\": \"(" + JsonStr + ")\"").r
        .findFirstMatchIn(torn).map(m => unesc(m.group(1)))
      if (!tornName.contains(name))
        throw new IllegalStateException(
          s"version $v already has a manifest for '${tornName.getOrElse("?")}' but " +
            s"the current pointer is at ${currentVersion.getOrElse(0)} — another " +
            s"writer is active on $root")
      val tornWriter = ("\"writerId\": \"(" + JsonStr + ")\"").r
        .findFirstMatchIn(torn).map(m => unesc(m.group(1)))
      if (!tornWriter.contains(writerId))
        // a DIFFERENT writer id on the same name is either this
        // store's previous incarnation recovering after a crash (the
        // path self-heal exists for) or a foreign writer racing on
        // the same name — indistinguishable without an atomic
        // catalog, so heal but say so loudly
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"commit('$name'): overwriting a torn v$v manifest written by " +
            s"${tornWriter.getOrElse("a pre-writerId store")} (this writer: " +
            s"$writerId) — expected after crash resume; if another job is " +
            s"live on $root, its commit is being discarded")
    }
    val out = dataPath(v, name)
    df.write.mode("overwrite").parquet(out) // the only pass over the data
    val partCounts = fileMetricsOf(out, statsCol)
    // a parquet write always leaves at least one part file (possibly
    // 0-row); an empty listing means a committer this store does not
    // understand — fall back to a read-back count rather than
    // recording rowCount 0 for data that exists
    val rowCount =
      if (partCounts.nonEmpty) partCounts.map(_._3).sum
      else spark.read.parquet(out).count()
    val inputs = df.inputFiles.sorted
    val json = new StringBuilder
    json.append("{\n")
    json.append(s"""  "version": $v,\n""")
    json.append(s"""  "parent": ${currentVersion.getOrElse(0)},\n""")
    json.append(s"""  "name": "${esc(name)}",\n""")
    json.append(s"""  "writerId": "${esc(writerId)}",\n""")
    json.append(s"""  "rowCount": $rowCount,\n""")
    statsCol.foreach(c => json.append(s"""  "statsCol": "${esc(c)}",\n"""))
    json.append(s"""  "schema": "${esc(df.schema.json)}",\n""")
    json.append("  \"files\": [\n")
    json.append(partCounts.map { case (f, p, c, mm) =>
      val stats = mm.map { case (lo, hi) => s""", "min": $lo, "max": $hi""" }.getOrElse("")
      s"""    {"path": "${esc(f)}", "partition": $p, "rows": $c$stats}"""
    }.mkString(",\n"))
    json.append("\n  ],\n")
    json.append("  \"lineage\": [")
    json.append(inputs.map(f => s""""${esc(f)}"""").mkString(", "))
    json.append("]\n}\n")
    Files.writeString(snapshotJson(v), json.toString)
    // atomic pointer flip
    val tmp = snapDir.resolve(s".current.tmp.$v")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** (path, write-partition, rows) per data file of a written
    * directory, from the parquet footers (metadata-only) and the
    * partition index the committer encodes in part file names.
    * Hadoop FS API, so the store works on any cluster filesystem.
    */
  def fileMetricsOf(dir: String): Seq[(String, Int, Long)] =
    fileMetricsOf(dir, None).map { case (f, p, r, _) => (f, p, r) }

  def fileMetricsOf(dir: String, statsCol: Option[String]): Seq[(String, Int, Long, Option[(Long, Long)])] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    // recursive: a partitionBy() layout nests part files under
    // key=value directories — a top-level-only listing would record
    // an empty manifest for a successfully written table
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) files += it.next()
    val statuses = files.toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.toString)
    def readOne(s: org.apache.hadoop.fs.FileStatus,
                conf: org.apache.hadoop.conf.Configuration): (String, Int, Long, Option[(Long, Long)]) = {
        val fname = s.getPath.getName
        // committer naming is "part-NNNNN-uuid..."; anything else
        // (foreign committers, over-long numeric prefixes) degrades
        // to -1 rather than failing the commit after the data is
        // written — digit count bounded so toInt cannot overflow
        val part = "part-(\\d{1,9})".r.findPrefixMatchOf(fname)
          .map(_.group(1).toInt).getOrElse(-1)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(s.getPath, conf))
        val (rows, mm) = try {
          val rc = reader.getRecordCount
          // integral min/max of statsCol across the file's row groups,
          // from the column-chunk statistics already in the footer; a
          // missing column / missing stats / non-integral type yields
          // None and the file simply stays unpruneable (always read)
          val stats = statsCol.flatMap { c =>
            val blocks = reader.getFooter.getBlocks.asScala.toSeq
            val perBlock = blocks.map { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == c)
                .map(_.getStatistics)
                .filter(st => st != null && st.hasNonNullValue)
                .flatMap { st =>
                  (st.genericGetMin, st.genericGetMax) match {
                    case (lo: Number, hi: Number)
                      if !lo.isInstanceOf[java.lang.Double] &&
                         !lo.isInstanceOf[java.lang.Float] =>
                      Some((lo.longValue(), hi.longValue()))
                    case _ => None
                  }
                }
            }
            if (perBlock.nonEmpty && perBlock.forall(_.isDefined))
              Some((perBlock.map(_.get._1).min, perBlock.map(_.get._2).max))
            else None
          }
          (rc, stats)
        } finally reader.close()
        (s.getPath.toString, part, rows, mm)
      }

    // footer reads are independent filesystem round-trips: run them on
    // a bounded pool — serially, a large table's footers would make
    // this "metadata-only" step O(file count) in driver round-trip
    // latency (order is preserved: futures are collected in order).
    // Each task gets its OWN Configuration copy (Hadoop Configuration
    // is not documented thread-safe — a lazy-init inside one reader
    // could race another's), and ExecutionException is unwrapped so
    // commit's failure surface stays the underlying IOException.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, statuses.size)))
    try statuses.map { s =>
      pool.submit(new java.util.concurrent.Callable[(String, Int, Long, Option[(Long, Long)])] {
        override def call(): (String, Int, Long, Option[(Long, Long)]) =
          readOne(s, new org.apache.hadoop.conf.Configuration(conf))
      })
    }.map { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }
    finally pool.shutdown()
  }

  /** Zone-map column the current version of `name` was committed
    * with, straight from the manifest — None when the snapshot
    * carries no stats. Callers that build pruning predicates against
    * an ASSUMED column (e.g. a pipeline resuming an old store) must
    * check this instead of trusting their own configuration: a
    * mismatch makes the residual filter silently drop every row.
    */
  def statsColOf(name: String): Option[String] = versionOf(name).flatMap { v =>
    val s = Files.readString(snapshotJson(v))
    ("\"statsCol\": \"(" + JsonStr + ")\"").r
      .findFirstMatchIn(s).map(m => unesc(m.group(1)))
  }

  /** Read `name` restricted to rows whose zone-map column lies in
    * [lo, hi]: manifest min/max stats select only the OVERLAPPING
    * data files (files committed without stats are conservatively
    * included), and the residual exact filter still applies — so the
    * result equals `read(name).filter(col between lo and hi)` while
    * scanning a subset of the files. [[prunedFiles]] exposes the
    * selection for plan/IO assertions.
    */
  def readPruned(name: String, lo: Long, hi: Long): DataFrame = {
    val v = versionOf(name).getOrElse(
      throw new IllegalArgumentException(s"no snapshot named '$name' in $root"))
    val s = Files.readString(snapshotJson(v))
    val statsCol = ("\"statsCol\": \"(" + JsonStr + ")\"").r
      .findFirstMatchIn(s).map(m => unesc(m.group(1))).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot '$name' v$v was committed without a statsCol"))
    val keep = prunedFiles(v, lo, hi)
    val schema = ("\"schema\": \"(" + JsonStr + ")\"").r.findFirstMatchIn(s)
      .map(m => org.apache.spark.sql.types.DataType.fromJson(unesc(m.group(1)))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(throw new IllegalStateException(s"no schema in manifest v$v"))
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(keep: _*)
    base.filter(col(statsCol).between(lo, hi))
  }

  /** Read `name` restricted to rows whose zone-map column is one of
    * `values` — the AOI/disc-cover consumer shape (a cover at the
    * tile level is a SET of cell ids, not one range). Files are kept
    * when at least one value lands inside their [min, max]; the exact
    * `isin` filter still applies, so the result equals
    * `read(name).filter(col isin values)` over a subset of the files.
    */
  def readPrunedIn(name: String, values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "values must be non-empty")
    val v = versionOf(name).getOrElse(
      throw new IllegalArgumentException(s"no snapshot named '$name' in $root"))
    val s = Files.readString(snapshotJson(v))
    val statsCol = ("\"statsCol\": \"(" + JsonStr + ")\"").r
      .findFirstMatchIn(s).map(m => unesc(m.group(1))).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot '$name' v$v was committed without a statsCol"))
    val sorted = values.distinct.sorted.toArray
    def anyIn(lo: Long, hi: Long): Boolean = {
      // binary search: first value >= lo, then check it is <= hi
      var a = 0; var b = sorted.length
      while (a < b) { val m = (a + b) >>> 1; if (sorted(m) < lo) a = m + 1 else b = m }
      a < sorted.length && sorted(a) <= hi
    }
    val keep = filesWhere(v, anyIn)
    val schema = ("\"schema\": \"(" + JsonStr + ")\"").r.findFirstMatchIn(s)
      .map(m => org.apache.spark.sql.types.DataType.fromJson(unesc(m.group(1)))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(throw new IllegalStateException(s"no schema in manifest v$v"))
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(keep: _*)
    base.filter(col(statsCol).isin(values: _*))
  }

  /** Number of file entries a manifest declares — counted by the
    * `"path":` key alone (appears once per file object and nowhere
    * else: lineage entries are plain strings). The file-entry parsers
    * below cross-check their exact-spacing regex against this count
    * and THROW on mismatch: a drifted manifest format must fail
    * loudly, not silently drop files from pruned reads (which would
    * return partial data) or from per-partition metrics.
    */
  private def fileEntryCount(s: String): Int =
    "\"path\":".r.findAllMatchIn(s).size

  private def checkFileParse(parsed: Int, s: String, what: String): Unit = {
    val declared = fileEntryCount(s)
    if (parsed != declared)
      throw new IllegalStateException(
        s"$what parsed $parsed of $declared file entries — manifest format " +
          "drift; refusing to return a partial file list")
  }

  /** Data files of version `v` kept by a zone-map predicate over
    * their (min, max); files without recorded stats are always kept.
    */
  private def filesWhere(v: Int, overlap: (Long, Long) => Boolean): Seq[String] = {
    val s = Files.readString(snapshotJson(v))
    val entries = ("\\{\"path\": \"(" + JsonStr + ")\", \"partition\": -?\\d+, \"rows\": \\d+" +
      "(?:, \"min\": (-?\\d+), \"max\": (-?\\d+))?\\}").r
      .findAllMatchIn(s).toSeq
    checkFileParse(entries.size, s, s"filesWhere(v$v)")
    entries
      .filter(m => m.group(2) == null ||
        overlap(m.group(2).toLong, m.group(3).toLong))
      .map(m => unesc(m.group(1)))
  }

  /** Data files of version `v` whose zone-map range intersects
    * [lo, hi]; files without recorded stats are always kept.
    */
  def prunedFiles(v: Int, lo: Long, hi: Long): Seq[String] =
    filesWhere(v, (mn, mx) => mn <= hi && mx >= lo)

  /** Per-partition metrics of a committed snapshot, parsed back from
    * its manifest (no data access): (partition_id, rows, file).
    */
  def fileMetrics(v: Int): Seq[(Int, Long, String)] = {
    val s = Files.readString(snapshotJson(v))
    val entries = ("\\{\"path\": \"(" + JsonStr + ")\", \"partition\": (-?\\d+), \"rows\": (\\d+)" +
      "(?:, \"min\": -?\\d+, \"max\": -?\\d+)?\\}").r
      .findAllMatchIn(s).toSeq
    checkFileParse(entries.size, s, s"fileMetrics(v$v)")
    entries.map(m => (m.group(2).toInt, m.group(3).toLong, unesc(m.group(1))))
  }

  /** Resumable checkpoint: if a committed snapshot named `name`
    * exists, read it back; otherwise compute, commit, and read back
    * (so downstream stages always consume the materialized files).
    */
  def getOrCompute(name: String)(compute: => DataFrame): DataFrame =
    getOrCompute(name, None)(compute)

  /** [[getOrCompute]] that, on the compute path, records zone-map
    * stats of `statsCol` in the manifest (see the stats-bearing
    * [[commit]]); the caller is expected to have clustered `compute`'s
    * output on that column so the per-file ranges are tight.
    */
  def getOrCompute(name: String, statsCol: Option[String])(compute: => DataFrame): DataFrame =
    versionOf(name) match {
      case Some(_) => read(name)
      case None => commit(name, compute, statsCol); read(name)
    }

  /** Copy-on-write MERGE (Iceberg `MERGE INTO ... WHEN MATCHED THEN
    * UPDATE WHEN NOT MATCHED THEN INSERT` semantics): rows of
    * `updates` replace current rows sharing their `keyCols` and new
    * keys append; every other current row carries over unchanged. The
    * result commits as a NEW version of `name` (one write job, like
    * every commit), so time travel still reads the pre-merge state.
    * Copy-on-write is the honest 100 TB default here: the carry-over
    * is one anti-join + union (shuffle on the key), with no delete
    * files or read-side merge machinery to mis-implement; use
    * partition-scoped names (or zone-map-pruned inputs) when only a
    * slice changes. Schemas must match by name.
    */
  def merge(name: String, updates: DataFrame, keyCols: Seq[String],
            statsCol: Option[String] = None): Int = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val cur0 = read(name)
    // SCHEMA EVOLUTION (Iceberg's add-column): updates may carry NEW
    // columns — existing rows take typed nulls for them (CoW rewrite,
    // so the new version's files all hold the full schema, while time
    // travel to older versions reads the old schema from their own
    // data). Updates may NOT omit existing columns: silently nulling
    // a replaced key's old values is a data-loss footgun, not
    // evolution. Shared columns must keep their type (add a NEW
    // column for a type change).
    val curCols = cur0.columns.toSet
    val dropped = cur0.columns.filterNot(updates.columns.toSet)
    require(dropped.isEmpty,
      s"merge updates omit existing columns ${dropped.mkString(",")} — " +
        "evolution may only ADD columns")
    val added = updates.columns.filterNot(curCols)
    cur0.schema.foreach { f =>
      val u = updates.schema(f.name)
      require(u.dataType == f.dataType,
        s"merge column '${f.name}' changes type ${f.dataType} -> " +
          s"${u.dataType}; add a new column instead")
    }
    val cur = added.foldLeft(cur0)((d, c) =>
      d.withColumn(c, lit(null).cast(updates.schema(c).dataType)))
    // Iceberg MERGE rejects a source with several rows per key (the
    // result would depend on row order / silently hold duplicate
    // keys); one cheap agg over the small updates side enforces that
    val dup = updates.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge source has multiple rows for key ${dup.headOption.mkString} — " +
        "deduplicate updates before merging")
    // zone-map continuity (same contract as compact): unless the
    // caller overrides, inherit the table's statsCol from the current
    // manifest and keep the output range-clustered on it — otherwise
    // a routine merge would silently strip pruning from the table
    val effStats = statsCol.orElse {
      val v = versionOf(name).get
      ("\"statsCol\": \"(" + JsonStr + ")\"").r
        .findFirstMatchIn(Files.readString(snapshotJson(v)))
        .map(m => unesc(m.group(1)))
    }
    val kept = cur.join(updates.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")
    val merged = kept.unionByName(updates)
    val out = effStats match {
      case Some(c) => merged.repartitionByRange(col(c))
      case None => merged
    }
    commit(name, out, effStats)
  }

  /** Expire all but the newest `keepLast` versions of every name
    * (Iceberg's expire-snapshots): each expired version's manifest
    * AND its version-scoped data directory are deleted — data dirs
    * are written fresh per commit, so an expired version's files are
    * referenced by no retained manifest (nothing orphaned, nothing
    * shared). Long-running ingest needs this: without retention the
    * store accretes every superseded version's data forever. The
    * `current` pointer never moves (the newest version of every name
    * is always retained), and [[readAt]] time travel keeps working
    * across the RETAINED versions; reads at expired versions fail
    * loudly. Returns the expired version numbers.
    */
  def expireSnapshots(keepLast: Int = 1): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val conf = spark.sessionState.newHadoopConf()
    snapshots.groupBy(_._2).toSeq.flatMap { case (name, vs) =>
      vs.map(_._1).sorted.dropRight(keepLast).map { v =>
        val dir = new org.apache.hadoop.fs.Path(dataPath(v, name))
        val fs = dir.getFileSystem(conf)
        if (fs.exists(dir)) fs.delete(dir, true)
        Files.deleteIfExists(snapshotJson(v))
        v
      }
    }.sorted
  }

  /** Compact the latest snapshot of `name` into ~`targetBytes` data
    * files (Iceberg's rewrite-data-files action): long-running ingest
    * at 100 TB accretes small files per micro-batch/commit, and scan
    * task count — hence driver scheduling and footer-reading load —
    * grows with file count, not byte count. The data is rewritten in
    * ONE pass, committed as a NEW version of the same name, so
    * history and [[readAt]] time travel keep working against the old
    * files; the new manifest's footer-derived rowCount is then
    * checked against the source manifest and a mismatch rolls the
    * `current` pointer back (also deleting the failed version's
    * rewritten data — nothing can leak) and throws.
    *
    * A zone-map snapshot (committed with a statsCol) keeps its
    * pruning guarantees: the rewrite RANGE-partitions on the stats
    * column (round-robin would smear every file's min/max across the
    * whole keyspace) and the new manifest records fresh stats.
    */
  def compact(name: String, targetBytes: Long = 128L << 20): Int = {
    val v = versionOf(name).getOrElse(
      throw new IllegalArgumentException(s"no snapshot named '$name' in $root"))
    val dir = dataPath(v, name)
    val statsCol = ("\"statsCol\": \"(" + JsonStr + ")\"").r
      .findFirstMatchIn(Files.readString(snapshotJson(v))).map(m => unesc(m.group(1)))
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) totalBytes += s.getLen
    }
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val before = snapshots.find(_._1 == v).map(_._3).getOrElse(0L)
    val src = spark.read.parquet(dir)
    val rewritten = statsCol match {
      case Some(c) => src.repartitionByRange(nFiles, col(c))
      case None => src.repartition(nFiles)
    }
    val newV = commit(name, rewritten, statsCol)
    val after = snapshots.find(_._1 == newV).map(_._3).getOrElse(-1L)
    if (after != before) {
      // roll the pointer back to the pre-compaction state and remove
      // the failed version's manifest AND rewritten data — leaving
      // the directory would orphan a full table copy that
      // expireSnapshots (manifest-driven) could never reclaim
      val tmp = snapDir.resolve(s".current.tmp.rollback.$v")
      Files.writeString(tmp, (newV - 1).toString)
      Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Files.deleteIfExists(snapshotJson(newV))
      val badDir = new org.apache.hadoop.fs.Path(dataPath(newV, name))
      if (fs.exists(badDir)) fs.delete(badDir, true)
      throw new IllegalStateException(
        s"compaction of '$name' rewrote $after rows, expected $before; rolled back to v${newV - 1}")
    }
    newV
  }

  /** Files added/removed between two snapshot versions of a name. */
  def diff(v1: Int, v2: Int): (Seq[String], Seq[String]) = {
    def files(v: Int): Set[String] = {
      val s = Files.readString(snapshotJson(v))
      ("\"path\"\\s*:\\s*\"(" + JsonStr + ")\"").r.findAllMatchIn(s).map(m => unesc(m.group(1))).toSet
    }
    val (a, b) = (files(v1), files(v2))
    ((b -- a).toSeq.sorted, (a -- b).toSeq.sorted)
  }
}
