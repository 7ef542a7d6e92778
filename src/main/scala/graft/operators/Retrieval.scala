package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring of a document corpus against a fixed term
  * query — the lexical-retrieval half of a training-data curation
  * stack (topic filtering, quality-targeted sampling, hybrid
  * retrieval next to the embedding ANN operators).
  *
  * Scale shape: tokens are cut to the QUERY'S terms before anything
  * shuffles (an `isin` filter against a literal list inside the
  * scan's codegen stage), so the only per-corpus shuffles are the
  * map-side-combined (doc, term) tf counts and per-doc lengths; the
  * per-term document frequencies are a ~|query|-row aggregate joined
  * back by broadcast, and the corpus constants (N, avgdl) ride along
  * as a broadcast single-row frame — no collect, no driver math.
  */
object Retrieval {

  /** ASCII-deterministic tokenization: non-alphanumerics collapse to
    * spaces BEFORE lowercasing (so case mapping only ever sees
    * A–Z — locale- and engine-independent), then split on spaces.
    */
  def tokens(text: Column): Column =
    filter(split(lower(regexp_replace(text, "[^A-Za-z0-9]+", " ")), " "),
      t => length(t) > 0)

  /** BM25(k1, b) scores: (idCol, score) for every document matching
    * at least one query term (descending relevance is `score` desc).
    * IDF uses the standard smoothed form ln(1 + (N - df + 0.5) /
    * (df + 0.5)), nonnegative for any df.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    // Locale.ROOT: document tokens lower-case locale-independently
    // (only A-Z survives the strip), so the query side must too — a
    // Turkish default locale would map "INDEX" to dotless-i and
    // silently match nothing
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    // corpus constants as a broadcast 1-row frame (plan-side, no collect)
    val stats = broadcast(toks.agg(
      count(lit(1)).cast("double").as("__N"), avg(col("__dl")).as("__avgdl")))
    // per-(doc, term) counts over query terms only — the isin cut
    // runs before the explode output ever shuffles
    val tf = toks
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val df_t = broadcast(tf.groupBy("__t")
      .agg(count(lit(1)).cast("double").as("__df")))
    tf.join(df_t, "__t")
      .crossJoin(stats)
      .withColumn("__idf",
        log(lit(1.0) + (col("__N") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("__tf") * (lit(k1) + 1.0) /
        (col("__tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(sum("__s").as("score"))
  }
}
