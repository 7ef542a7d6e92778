package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style (Wenzek et al.
  * 2020) "perplexity against a reference corpus" quality signal, with
  * the KenLM n-gram model reduced to its add-k-smoothed unigram core
  * so the whole thing stays relational (and DuckDB-mirrorable): docs
  * whose token distribution diverges from the reference score a high
  * mean negative log-likelihood and can be filtered or bucketed.
  *
  * Scale shape: training is one explode + one map-side-combinable
  * count (the combine collapses each partition to <= |vocab| rows
  * before the shuffle). Scoring joins tokens against the model as a
  * BROADCAST — a unigram vocabulary is small by construction
  * (web-scale corpora cap out around 1e7 distinct lower-cased tokens,
  * a subword vocab at ~1e5), while a shuffle join on the token key
  * would land every occurrence of a hot token ("the") on one reducer.
  * After the broadcast the scoring pass is map-only up to the final
  * per-doc average (one shuffle on the doc id, partially aggregated).
  */
object LangModel {

  /** Unigram counts of the training corpus: one row per distinct
    * token of `split(lower(text), " ")` (empties kept — same split
    * contract as the rest of the text family), with its total
    * occurrence count. Null-text rows are dropped by contract.
    */
  def unigramCounts(train: DataFrame, textCol: String): DataFrame =
    train.filter(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Score each document against a unigram model (a (token, cnt)
    * frame from [[unigramCounts]]): per token instance,
    * nll = -ln((cnt + k) / (N + k * (V + 1))) with N = total model
    * tokens, V = model vocabulary size, and cnt = 0 for tokens the
    * model has never seen (the +1 in the denominator is the shared
    * unseen-token type of add-k smoothing). Output: one row per input
    * doc — (id, n_tokens, avg_nll, ppl = e^avg_nll). Null-text rows
    * are dropped by contract; k must be > 0 so unseen tokens get
    * finite mass.
    */
  def unigramScore(score: DataFrame, idCol: String, textCol: String,
                   model: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0.0, s"smoothing k must be > 0 (got $k)")
    // model-wide constants as a broadcast 1-row frame (plan-side, no
    // collect — same pattern as Retrieval.bm25's corpus stats)
    val stats = model.agg(sum("cnt").cast("double").as("__N"),
      count(lit(1)).cast("double").as("__V"))
    val toks = score.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(col(textCol)), " "))
        .as("token"))
    toks.join(broadcast(model), Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("__nll", -log((coalesce(col("cnt"), lit(0L)).cast("double") + k) /
        (col("__N") + lit(k) * (col("__V") + 1.0))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg("__nll").as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }
}
