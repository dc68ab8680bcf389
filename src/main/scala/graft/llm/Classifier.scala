package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear bag-of-tokens quality classifier — the "cheap model filter"
  * stage of a training-data curation pipeline (the role fastText-style
  * linear classifiers play in CCNet/GPT-3-era curation: a heuristic or
  * small labeled set trains a model cheap enough to score every
  * document in the corpus).
  *
  * Training is CLOSED-FORM — pure counting aggregations, no gradient
  * loop: per token t and class c, the smoothed class-conditional
  * occurrence rate
  *
  *   rate_c(t) = (count_c(t) + 1) / (total_c + V)
  *
  * (Laplace smoothing, V = vocabulary size) and the token's weight is
  * the scaled RATE DIFFERENCE
  *
  *   weight_ppm(t) = ppm(rate_pos(t)) − ppm(rate_neg(t))
  *
  * A document's score is the sum of its tokens' weights (with
  * multiplicity) and the prediction is `score > 0`. This is a linear
  * classifier over the bag-of-tokens feature map, exactly like
  * multinomial Naive Bayes except that NB sums LOG rate ratios where
  * we sum rate differences: the log is deliberately traded away so
  * every quantity is exact integer arithmetic (`div`, no libm) and a
  * DuckDB oracle reproduces training AND inference bit-for-bit — the
  * repo-wide correctness convention (see [[TextAnalysis]]). Per token
  * the two scores agree in sign (rate_pos > rate_neg ⇔ log ratio > 0);
  * the aggregate differs only in how strongly extreme tokens dominate.
  *
  * Labels come from [[TextAnalysis.qualityLabeled]] — the integer
  * quality heuristic as the pseudo-labeling teacher (classic
  * distillation: the student generalizes to tokens the heuristic never
  * looks at, and at 100 TB the heuristic runs once to label a slice
  * while the linear model scores everything).
  *
  * Scale shape:
  *   - training = one corpus scan → explode to (hq, token) →
  *     partial-aggregated hash count by token. The shuffle carries ONE
  *     slim row per (partition, distinct token) after map-side
  *     combine; raw text never shuffles.
  *   - class totals + vocab size = a 1-row aggregate of the
  *     vocab-sized count table, joined back via `broadcast` (the same
  *     parameter-broadcast pattern as the ANN codebooks).
  *   - inference = stateless explode + broadcast hash join against the
  *     vocab-sized weight table + per-doc partial sum. No shuffle
  *     carries anything wider than (doc_id, long).
  */
object Classifier {

  /** Default pseudo-label threshold: the documents-table quality
    * heuristic spans ≈[266, 533] with median ≈469 on the driver corpus,
    * so ≥470 splits the corpus near-evenly — balanced classes without a
    * prior term. */
  val QualityThreshold = 470L

  /** Per-token class counts and linear weights:
    * `(token, cnt_pos, cnt_neg, weight_ppm)`.
    *
    * `weight_ppm > 0` ⇔ the token is (smoothed-)more frequent per
    * token-slot in high-quality docs than in low-quality docs. */
  def tokenWeights(docs: DataFrame,
                   threshold: Long = QualityThreshold): DataFrame = {
    // explode_outer: `toks` collapses back into an expression under
    // CollapseProject, and plain explode would let
    // InferFiltersFromGenerate duplicate the tokenize pipeline into a
    // scan filter (same dodge as Dedup.minhashSignatures)
    val tok = TextAnalysis.qualityLabeled(docs, threshold)
      .select(col("hq"), explode_outer(col("toks")).as("token"))
      .filter(col("token").isNotNull) // empty docs train nothing
    val counts = tok.groupBy("token").agg(
      sum(col("hq")).as("cnt_pos"),
      sum(lit(1L) - col("hq")).as("cnt_neg"))
    val totals = counts.agg(
      sum(col("cnt_pos")).as("pos_total"),
      sum(col("cnt_neg")).as("neg_total"),
      count(lit(1)).as("vocab"))
    counts.crossJoin(broadcast(totals))
      .withColumn("rate_pos_ppm",
        expr("(1000000 * (cnt_pos + 1)) div (pos_total + vocab)"))
      .withColumn("rate_neg_ppm",
        expr("(1000000 * (cnt_neg + 1)) div (neg_total + vocab)"))
      .select(col("token"), col("cnt_pos"), col("cnt_neg"),
        (col("rate_pos_ppm") - col("rate_neg_ppm")).as("weight_ppm"))
  }

  /** Score every document with the trained weights:
    * `(doc_id, n_tokens, score_ppm, pred_hq, heur_hq)` — the model's
    * prediction (`score_ppm > 0`) next to the teacher label, so
    * train-set agreement is one aggregation away.
    *
    * Out-of-vocabulary tokens score 0 (cannot happen when scoring the
    * training corpus itself, but the broadcast left join is the
    * contract for scoring a NEW corpus with a frozen weight table).
    * Token-less documents keep a row with `n_tokens = 0, score = 0`
    * via the null row `explode_outer` emits. */
  def scoreDocs(docs: DataFrame,
                threshold: Long = QualityThreshold): DataFrame =
    scoreWith(docs, tokenWeights(docs, threshold), threshold)

  /** Default threshold grid for [[prCurve]] (ppm score cutoffs,
    * roughly log-spaced around the 0 decision point). */
  val PrThresholds: Seq[Long] =
    Seq(-8000L, -4000L, -2000L, -1000L, 0L, 1000L, 2000L, 4000L, 8000L)

  /** Exact ROC AUC of `score_ppm` against the teacher label, as one
    * row `(n_pos, n_neg, auc_pm)` — the tie-aware Mann-Whitney
    * rank-sum form: with R⁺ the sum of AVERAGE ranks of the positives
    * under ascending score,
    *
    *   AUC = (R⁺ − n_pos·(n_pos+1)/2) / (n_pos·n_neg)
    *
    * computed entirely in integers by carrying 2·rank (so tie-group
    * average ranks stay integral) and truncating to permille at the
    * end. `auc_pm` is NULL when a class is absent.
    *
    * Scale shape: rows collapse to the DISTINCT-SCORE aggregate first
    * (one partial-aggregated shuffle), so the global rank window runs
    * over score VALUES, not documents — bounded by the score domain,
    * millions of rows never reach a single-partition sort. */
  def auc(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = scored.groupBy(col("score_ppm")).agg(
      count(lit(1)).as("n"), sum(col("heur_hq")).as("np"))
    val w = Window.orderBy(col("score_ppm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grp
      .withColumn("cum_n", sum(col("n")).over(w))
      // 2·(average rank of the tie group) = 2·min_rank + (n − 1)
      .withColumn("r2", lit(2L) * (col("cum_n") - col("n") + 1L) + col("n") - 1L)
    ranked
      .agg(
        sum(col("np") * col("r2")).as("s2"),
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") * col("n_neg") === 0L, lit(null).cast("long"))
          .otherwise(expr("(1000 * (s2 - n_pos * (n_pos + 1))) div (2 * n_pos * n_neg)"))
          .as("auc_pm"))
  }

  /** Precision/recall sweep over a fixed threshold grid:
    * `(thr, tp, fp, fn, tn, precision_pm, recall_pm)`, prediction =
    * `score_ppm > thr`. One corpus pass: the grid explodes each scored
    * row |grid| ways and partial aggregation collapses to |grid| rows
    * map-side, so the shuffle carries |grid|·partitions tiny rows. */
  def prCurve(scored: DataFrame,
              thresholds: Seq[Long] = PrThresholds): DataFrame =
    scored
      .select(col("score_ppm"), col("heur_hq"),
        explode(array(thresholds.map(lit): _*)).as("thr"))
      .groupBy("thr")
      .agg(
        sum(when(col("score_ppm") > col("thr") && col("heur_hq") === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score_ppm") > col("thr") && col("heur_hq") === 0L, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score_ppm") <= col("thr") && col("heur_hq") === 1L, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("score_ppm") <= col("thr") && col("heur_hq") === 0L, 1L)
          .otherwise(0L)).as("tn"))
      .withColumn("precision_pm",
        when(col("tp") + col("fp") === 0L, 0L)
          .otherwise(expr("(1000 * tp) div (tp + fp)")))
      .withColumn("recall_pm",
        when(col("tp") + col("fn") === 0L, 0L)
          .otherwise(expr("(1000 * tp) div (tp + fn)")))

  /** Freeze the weight table into a driver-side map for shipping as a
    * literal into stateless per-row scoring ([[scoreExpr]], the
    * streaming model gate): the `topK` weights by |weight_ppm| (ties
    * on token text). Parameter-bounded collect — K rows, like the
    * ANN codebooks and the decontamination Bloom words; production
    * gates truncate their models the same way (the tail of tiny
    * weights moves scores by less than the decision margin). */
  def freezeWeights(docs: DataFrame, topK: Int = 4096,
                    threshold: Long = QualityThreshold): Map[String, Long] =
    tokenWeights(docs, threshold)
      .orderBy(abs(col("weight_ppm")).desc, col("token"))
      .limit(topK)
      .select("token", "weight_ppm")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  /** Per-row score of a text column under a FROZEN weight map — no
    * explode, no aggregation, no join: one native higher-order fold
    * over the token array against a map literal, so the expression is
    * legal anywhere a filter predicate is (in particular inside a
    * streaming plan where a groupBy would demand watermark
    * semantics). OOV tokens score 0, token-less docs score 0 — same
    * contract as [[scoreWith]]. */
  def scoreExpr(text: org.apache.spark.sql.Column,
                weights: Map[String, Long]): org.apache.spark.sql.Column = {
    val wmap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (t, w) => Seq(lit(t), lit(w)) }: _*)
    aggregate(TextFns.tokens(text), lit(0L),
      (acc, t) => acc + coalesce(element_at(wmap, t), lit(0L)))
  }

  /** [[scoreDocs]] with an explicit (frozen) weight table — the
    * train-once / score-many split a real pipeline uses. */
  def scoreWith(docs: DataFrame, weights: DataFrame,
                threshold: Long = QualityThreshold): DataFrame =
    TextAnalysis.qualityLabeled(docs, threshold)
      .select(col("doc_id"), col("hq").as("heur_hq"),
        explode_outer(col("toks")).as("token"))
      .join(broadcast(weights.select(col("token"), col("weight_ppm"))),
        Seq("token"), "left")
      .groupBy("doc_id", "heur_hq")
      .agg(
        count(col("token")).as("n_tokens"),
        sum(coalesce(col("weight_ppm"), lit(0L))).as("score_ppm"))
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"),
        (coalesce(col("score_ppm"), lit(0L)) > 0).cast("long").as("pred_hq"),
        col("heur_hq"))

  /** Decile lift table over [[scoreDocs]] output: rank by score, split
    * into `nBuckets` equal groups, and report each group's positive
    * rate against the global rate (lift_pm = 1000 means no better than
    * random; the top decile of a useful model reads far above it).
    * The practitioner's complement to [[auc]]: AUC says the ranking is
    * good somewhere, lift says WHERE to cut.
    *
    * Like [[auc]], this is an evaluation-sample operator: `ntile` over
    * a global order is a global sort by definition of deciles — run it
    * on the bounded eval split, not a 100 TB corpus. NULL lift when no
    * positives exist, not a division blow-up. */
  def lift(scored: DataFrame, nBuckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = scored
      .select(col("doc_id"), col("score_ppm"), col("heur_hq"))
      .withColumn("decile", ntile(nBuckets)
        .over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
        .cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("heur_hq").as("n_pos"))
    per
      .join(broadcast(per.agg(sum("n_docs").as("td"), sum("n_pos").as("tp"))))
      .select(col("decile"), col("n_docs"), col("n_pos"),
        expr("(1000 * n_pos) div n_docs").as("pos_rate_pm"),
        when(col("tp") > 0,
          expr("(1000 * n_pos * td) div (n_docs * tp)")).as("lift_pm"))
  }
}
