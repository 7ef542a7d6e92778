package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Corpus-level boilerplate detection — the C4-style "remove text
  * that repeats across documents" signal (Raffel et al. 2020 strip
  * lines occurring >= 3 times in the corpus; reference pipelines for
  * web-scale training data all carry a variant). The unit here is the
  * word n-gram rather than the newline-delimited line, which covers
  * corpora without line structure and subsumes the line form (a
  * repeated line is a run of repeated n-grams).
  *
  * Scale shape (the part that matters at 100 TB): document text NEVER
  * shuffles — each doc is reduced to its distinct n-gram HASHES by one
  * JITed kernel pass, and only those 8-byte hashes move. Doc frequency
  * is a map-side-combinable count over per-doc-distinct grams, and the
  * gram frame feeds both the frequency aggregate and the shared-gram
  * join through the SAME hash partitioning, so Catalyst reuses one
  * exchange for both consumers.
  */
object Boilerplate {

  /** Sorted distinct word-n-gram hashes of `text` (see
    * [[DedupKernels.distinctGramHashes]] for the split/hash contract).
    * basis "xx" (default, fast) or "md5" (DuckDB-oracle-comparable).
    */
  def gramHashes(text: Column, n: Int, basis: String = "xx"): Column = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    org.apache.spark.sql.GraftSqlBridge.staticInvoke(
      Class.forName("graft.operators.DedupKernels"),
      ArrayType(LongType, containsNull = false), "distinctGramHashes",
      Seq(text, lit(n), lit(basis)),
      Seq(StringType, IntegerType, StringType))
  }

  /** Per-document shared-n-gram statistics: `total_grams` = distinct
    * word n-grams in the doc, `shared_grams` = how many of those occur
    * in >= `minDocs` documents corpus-wide (the count INCLUDES the doc
    * itself, so minDocs = 2 means "appears in at least one other
    * document"), `boilerplate_frac` = shared / max(total, 1).
    *
    * Null-text rows are dropped by contract (same as [[Sessions]]);
    * docs with fewer than n words come out with total_grams = 0 and
    * frac 0.0.
    */
  def sharedNgramStats(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minDocs: Int = 2,
                       basis: String = "xx"): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1 (got $minDocs)")
    // ONE kernel pass: the per-doc total rides the exploded rows
    // (explode_outer keeps zero-gram docs as a null-gram row), and
    // one explicit __gh exchange serves BOTH consumers — the dfreq
    // aggregation and the gram↔dfreq join — via exchange reuse, so
    // the dominant cost (hashing every gram of every doc) is paid
    // exactly once instead of once per plan branch.
    val grams = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), gramHashes(col(textCol), n, basis).as("__gs"))
      .select(col(idCol), size(col("__gs")).cast("long").as("__tot"),
        explode_outer(col("__gs")).as("__gh"))
      .repartition(col("__gh"))
    // per-doc arrays are DISTINCT, so count(*) per hash IS the doc
    // frequency (the null-gram rows form a group no equi-join can hit)
    val dfreq = grams.groupBy("__gh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__gh"), lit(1).as("__shared"))
    grams.join(dfreq, Seq("__gh"), "left")
      .groupBy(idCol)
      .agg(max(col("__tot")).as("total_grams"),
        count(col("__shared")).as("shared_grams"))
      .select(col(idCol), col("total_grams"), col("shared_grams"),
        (col("shared_grams").cast("double") /
          greatest(col("total_grams"), lit(1)).cast("double"))
          .as("boilerplate_frac"))
  }
}
