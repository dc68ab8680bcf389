package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFns._

/** Lexical retrieval over the corpus: distributed BM25-shaped top-k
  * search — the keyword-side complement of the embedding ANN family
  * ([[Similarity]], [[AnnIndex]]). In a training-data pipeline this is
  * the workhorse for targeted corpus probes ("find the documents about
  * X") and for lexical decontamination triage.
  *
  * Scoring is the Robertson/Spärck Jones BM25 shape (k1 = 1.2,
  * b = 0.75) with one deliberate substitution: the idf is the RATIONAL
  * `(N − df + 1)/(df + 1)` instead of its logarithm, and every factor
  * is fixed-point integer arithmetic (permille scale, truncating
  * `div`). Rationale, in repo-wide convention order (see
  * [[TextAnalysis]]): no libm call may reach an oracle-checked result
  * (Spark and DuckDB disagree on the last ulp of `ln`), and no float
  * sum may depend on aggregation order. Within one query the rational
  * idf is a monotone function of df exactly like the log idf, so
  * per-term ranking is preserved; across terms, rarer terms weigh MORE
  * than log-idf BM25 would weigh them (linear vs logarithmic growth) —
  * documented, deterministic, engine-exact. The idf saturates at
  * [[IdfCapPm]] so the contribution arithmetic stays overflow-free at
  * any corpus size (ANSI mode would fail loudly, not corrupt).
  *
  * Per (doc, term): with dl = doc tokens, avgdl = mean doc tokens,
  *
  *   idf_pm     = min(IdfCapPm, 1000·(N − df + 1) div (df + 1))
  *   dlr_pm     ≈ 1000·dl/avgdl   (length ratio)
  *   den_pm     = 1000·tf + 300 + (9·dlr_pm) div 10
  *                                ≈ 1000·(tf + k1·(1 − b + b·dl/avgdl))
  *   contrib_pm = 2200·tf·idf_pm div den_pm ≈ 1000·idf·tf·(k1+1)/den
  *
  * and score_pm = Σ contrib_pm over matched query terms (integer sum —
  * order-independent).
  *
  * Scale shape:
  *   - one corpus scan stages (doc_id, dl, toks); the query-term
  *     filter hits the exploded stream BEFORE any aggregation, so only
  *     (doc_id, dl, matched-term) rows — a |Q|-bounded sliver of the
  *     corpus — ever reach a shuffle. Raw text never shuffles.
  *   - df and corpus stats (N, avgdl) are |Q|-row / 1-row aggregates
  *     joined back via `broadcast` — the parameter-broadcast pattern.
  *   - the final top-k is `TakeOrderedAndProject` (per-partition heap +
  *     driver merge of k rows), never a global sort; the rank window
  *     runs over the ≤ k survivor rows only.
  */
object Retrieval {

  /** idf saturation (permille): keeps `2200·tf·idf_pm` far below 2^63
    * for any realistic tf, and caps the weight a vanishingly-rare term
    * can carry (same motivation as Lucene's idf clamp). */
  val IdfCapPm = 10000000L

  /** Default probe query for the registered driver query (mid-df terms
    * of the synthetic documents vocabulary). */
  val DefaultQuery: Seq[String] = Seq("spark", "vector", "stream")

  /** BM25 top-k: `(doc_id, n_terms, score_pm, rank)` for the `k`
    * best-scoring documents, ties broken on doc_id ascending. */
  /** Positional phrase search: documents containing the EXACT token
    * sequence `phrase`, with per-doc occurrence counts — the
    * inverted-index phrase query (postings intersection on positions),
    * computed without ever re-scanning document text at query time.
    *
    * The anchor trick makes it one aggregate instead of k−1 joins:
    * a posting of phrase token j at position p can only participate in
    * a match anchored at `p − j`, so postings project to
    * (doc_id, anchor, j) and a full match is an anchor holding ALL k
    * distinct j values. The filter to phrase tokens happens on the
    * postings scan (pushdown against a stored index; here the postings
    * are derived in the same plan), so the shuffle carries only
    * postings of the k phrase tokens — at corpus scale, the posting
    * lists, never the corpus. Repeated tokens in the phrase are
    * handled by requiring each OFFSET j to be present (distinct j
    * count), not distinct token strings. */
  def phraseSearch(docs: DataFrame, phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty, "empty phrase")
    val k = terms.size
    // phrase offset map as a small literal relation: (term, j)
    val offsets = terms.zipWithIndex
      .map { case (t, j) => s"('${t.replace("'", "''")}', ${j}L)" }
    val postings = docs
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token").isInCollection(terms))
    postings
      .join(broadcast(
        postings.sparkSession.sql(
          s"SELECT * FROM VALUES ${offsets.mkString(", ")} AS t(token, j)")),
        "token")
      .select(col("doc_id"), (col("pos").cast("long") - col("j")).as("anchor"),
        col("j"))
      .groupBy("doc_id", "anchor")
      .agg(countDistinct("j").as("n_offsets"))
      .filter(col("n_offsets") === k.toLong)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  def bm25TopK(docs: DataFrame,
               terms: Seq[String] = DefaultQuery,
               k: Int = 10): DataFrame = {
    val staged = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        col("toks"))
    val stats = staged
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .withColumn("avgdl_pm", expr("(1000 * total_tokens) div n_docs"))
    // explode_outer: same InferFiltersFromGenerate dodge as Classifier /
    // Dedup (toks re-inlines under CollapseProject); the isin filter
    // drops the null row explode_outer adds for empty docs.
    val matches = staged
      .select(col("doc_id"), col("dl"), explode_outer(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).as("tf"))
    val dfTab = matches.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = matches
      .join(broadcast(dfTab), Seq("token"))
      .crossJoin(broadcast(stats.select(col("n_docs"), col("avgdl_pm"))))
      .withColumn("idf_pm", least(lit(IdfCapPm),
        expr("(1000 * (n_docs - df + 1)) div (df + 1)")))
      .withColumn("dlr_pm", expr("(1000000 * dl) div avgdl_pm"))
      .withColumn("den_pm", expr("1000 * tf + 300 + (9 * dlr_pm) div 10"))
      .withColumn("contrib_pm", expr("(2200 * tf * idf_pm) div den_pm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib_pm")).as("score_pm"))
    scored
      .orderBy(col("score_pm").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score_pm").desc, col("doc_id")))
        .cast("long"))
  }

  /** Query-side semantic top-k: the query string is embedded by the
    * SAME hashing vectorizer as the corpus ([[TextAnalysis
    * .hashVectors]] — token polyhash mod 64 count vector), then scored
    * with the exact integer-dot cosine of the [[Similarity]] stack.
    * One corpus scan against a 1-row broadcast query vector, final
    * top-k is TakeOrderedAndProject — the dense-retrieval twin of
    * [[bm25TopK]], sharing its `(doc_id, score, rank)` contract. */
  def semanticTopK(docs: DataFrame,
                   terms: Seq[String] = DefaultQuery,
                   k: Int = 10): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val corpus = TextAnalysis.hashVectors(docs)
      .withColumn("nrm", sqrt(Similarity.norm2Q(col("qv")).cast("double")))
    val q = TextAnalysis.hashVectors(
        Seq((-1L, terms.mkString(" "))).toDF("doc_id", "text"))
      .select(col("qv").as("query_v"))
      .withColumn("qnrm",
        sqrt(Similarity.norm2Q(col("query_v")).cast("double")))
    corpus.crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        (Similarity.dotQ(col("qv"), col("query_v")).cast("double") /
          (col("nrm") * col("qnrm"))).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), round(col("cos"), 6).as("score"), col("rank"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    * K = 60) of the lexical [[bm25TopK]] and semantic [[semanticTopK]]
    * pools. Scores never mix — only RANKS do, which is why RRF is the
    * standard fusion when the two scorers live on incomparable scales —
    * and `1000000 div (60 + rank)` keeps the fused score integer-exact
    * (micro-units; a doc missing from one pool contributes 0 there).
    * Both pools are ≤ `poolK` rows, so the fusion join broadcasts and
    * costs nothing at any corpus scale; the heavy lifting stays in the
    * two retrievers' own bounded top-k plans. */
  def hybridTopK(docs: DataFrame,
                 terms: Seq[String] = DefaultQuery,
                 k: Int = 10, poolK: Int = 20): DataFrame = {
    val lex = bm25TopK(docs, terms, poolK)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val sem = semanticTopK(docs, terms, poolK)
      .select(col("doc_id"), col("rank").as("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + sem_rank)"), lit(0L)))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf_micro").desc, col("doc_id")))
        .cast("long"))
  }
}
