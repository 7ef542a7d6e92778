package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the "n-gram overlap against
  * the evaluation sets" decontamination step every serious
  * training-data pipeline runs before training (GPT-3 appendix C
  * removes 13-gram collisions with the eval sets; PaLM and Llama
  * carry variants of the same rule). A training document is
  * contaminated when enough of its word n-grams also occur in any
  * eval-set document.
  *
  * Scale shape: the TRAINING side (the 100 TB side) is reduced to
  * distinct gram hashes by the same one-pass JITed kernel as
  * [[Boilerplate]] — raw text never shuffles. The EVAL side is small
  * by construction (benchmarks are thousands of documents, so their
  * distinct-gram table is a few million 8-byte hashes), so it rides
  * as a BROADCAST to the overlap join and the whole detection is
  * map-side up to the final per-doc count (one shuffle on the doc id,
  * partially aggregated). Nothing here is quadratic in either corpus.
  */
object Contamination {

  /** Per-training-document overlap statistics against an eval corpus:
    * `total_grams` = distinct word n-grams in the doc,
    * `overlap_grams` = how many of those occur anywhere in
    * `evalDocs`, `contaminated` = overlap_grams >= minOverlap.
    * Null-text rows are dropped on BOTH sides by contract; docs
    * shorter than n words come out with 0/0/false. basis "xx"
    * (default, fast) or "md5" (DuckDB-oracle-comparable) — see
    * [[DedupKernels.distinctGramHashes]] for the split/hash contract.
    */
  def overlapStats(docs: DataFrame, idCol: String, textCol: String,
                   evalDocs: DataFrame, evalTextCol: String,
                   n: Int = 13, minOverlap: Int = 1,
                   basis: String = "xx"): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1 (got $minOverlap)")
    val evalGrams = evalDocs.filter(col(evalTextCol).isNotNull)
      .select(explode(Boilerplate.gramHashes(col(evalTextCol), n, basis))
        .as("__gh"))
      .distinct()
    // ONE kernel pass: per-doc totals ride the exploded rows
    // (explode_outer keeps zero-gram docs), the broadcast overlap
    // join marks hits in place, and a single per-doc aggregation
    // yields total + overlap — no second gramHashes evaluation, no
    // doc-id re-join, and the only shuffle is the final groupBy.
    grams(docs, idCol, textCol, n, basis)
      .join(broadcast(evalGrams.select(col("__gh"), lit(1).as("__hit"))),
        Seq("__gh"), "left")
      .groupBy(idCol)
      .agg(max(col("__tot")).as("total_grams"),
        count(col("__hit")).as("overlap_grams"))
      .select(col(idCol), col("total_grams"), col("overlap_grams"),
        (col("overlap_grams") >= minOverlap).as("contaminated"))
  }

  /** (idCol, __tot, __gh) rows: one gram-hash kernel pass with the
    * per-doc gram count carried through the explode (outer, so
    * zero-gram docs survive as a null-gram row no equi-join hits).
    */
  private def grams(docs: DataFrame, idCol: String, textCol: String,
                    n: Int, basis: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        Boilerplate.gramHashes(col(textCol), n, basis).as("__gs"))
      .select(col(idCol), size(col("__gs")).cast("long").as("__tot"),
        explode_outer(col("__gs")).as("__gh"))
}
