package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language modeling for curation: the CCNet-style
  * "perplexity filter" (Wenzek et al. 2020, CCNet) re-expressed with a
  * unigram LM trained on the corpus itself, and the temperature-based
  * source mixing weights (multilingual α-sampling à la mBERT/XLM-R)
  * that a training run draws from.
  *
  * Cross-engine determinism: instead of floating-point logs, token
  * surprisal is quantized to WHOLE BITS — `floor(log2(N div cnt))`
  * computed as `length(bin(N div cnt)) - 1`, pure integer arithmetic
  * that any engine reproduces exactly (DuckDB: `printf('%b', …)`).
  * The only non-integer step anywhere is `floor(sqrt(double))` in the
  * mixture weights, and IEEE sqrt is correctly rounded on every
  * engine, with the argument exactly representable (< 2^53).
  */
object LangModel {

  /** Per-document unigram surprisal score and keep verdict.
    *
    * Train: corpus unigram counts `cnt(token)` and total `N`. Score: a
    * document's cost is `Σ_tokens floor(log2(N div cnt))` bits — rare
    * tokens are expensive, common ones cheap — normalized to
    * milli-bits per token. Gate: `kept = 1` iff the rate is at most
    * `keepMaxMillibits` (high-surprisal docs read as noise/gibberish —
    * the same decision CCNet makes with a KenLM perplexity).
    *
    * Scale shape: the exploded token stream collapses twice map-side —
    * per-(doc, token) term frequency and the vocab-sized unigram
    * table — so the only wide shuffle carries distinct-per-doc tokens,
    * not occurrences. The surprisal join is vocab × doc-vocab on the
    * token key; `N` rides along as a 1-row broadcast. Token-less
    * documents drop (no rate to score), same contract as
    * [[TextAnalysis.hashVectors]].
    */
  def unigramSurprisal(docs: DataFrame,
                       keepMaxMillibits: Long = 4030L): DataFrame = {
    val dt = docs.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("token"))
    val tf = dt.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val uni = dt.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = uni.agg(sum("cnt").as("n_total"))
    tf.join(uni, "token")
      .join(broadcast(total))
      .select(col("doc_id"), col("tf"),
        (length(bin(expr("n_total div cnt"))) - 1).cast("long").as("bits"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_tokens"), col("total_bits"),
        expr("(1000 * total_bits) div n_tokens").as("millibits_per_token"))
      .withColumn("kept",
        when(col("millibits_per_token") <= keepMaxMillibits, 1L).otherwise(0L))
  }

  /** Temperature-based data-mixing weights over sources (α = 0.5):
    * sample probability ∝ n_tokens^α, the standard move that
    * up-weights small sources relative to their natural share without
    * letting any single giant source dominate an epoch.
    *
    * Columns: natural token share, the α-weight `floor(sqrt(n_tokens))`,
    * the sampled share, and the up/down-sampling ratio vs natural
    * (permille of permilles — NULL for a source too small to register
    * a natural permille, rather than a division blow-up).
    *
    * One fused scan → one ~|sources|-group shuffle; the two grand
    * totals are 1-row broadcasts. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val bySource = docs
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("wc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("wc").as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = bySource.agg(sum("n_tokens").as("tok_total"),
      sum("w").as("w_total"))
    bySource.join(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000 * n_tokens) div tok_total").as("natural_pm"),
        col("w"),
        expr("(1000 * w) div w_total").as("share_pm"))
      .withColumn("temp_ratio_pm",
        when(col("natural_pm") > 0,
          expr("(1000 * share_pm) div natural_pm")))
  }
}
