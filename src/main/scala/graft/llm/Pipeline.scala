package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFns._

/** The capstone composition: an end-to-end training-data prep pipeline —
  * language filter → quality filter → exact dedup (canonical keeper) →
  * PII redaction → token accounting — as ONE lazy DataFrame plan,
  * oracle-checked end to end.
  *
  * Shuffle budget at 100 TB (the reason each stage is shaped this way):
  *   - scoring (lang + quality) is a stateless projection fused into the
  *     scan — the token array is staged once and every marker count
  *     reads the staged column (no recompute, no shuffle);
  *   - the language/quality FILTER runs before anything shuffles, so
  *     rejected documents (the majority, on web-scale corpora) never
  *     leave their input partition;
  *   - exact dedup shuffles (digest, doc_id) pairs only — 32 bytes + id
  *     per surviving doc, never text;
  *   - the winner join brings text through exactly ONE shuffle (both
  *     sides hash-partitioned on doc_id);
  *   - redaction + token stats are stateless projections on the
  *     deduplicated survivors (the smallest relation in the plan).
  *
  * Known trade (same as [[Dedup.simhashDedup]]'s recomputed sketch):
  * the `kept` scoring subtree is evaluated twice — once under the slim
  * dedup aggregate and once on the join side — because both consumers
  * reference it in one lazy plan. The recompute is stateless and
  * scan-bound; the alternative (a window min/count over content_key)
  * would funnel each content class into one task — the hot-key sort
  * SkewSpec measures at ~6× — and a hot boilerplate class at 100 TB is
  * exactly when that breaks. Callers who prefer compute over scan can
  * checkpoint the scored frame and pass it in.
  */
object Pipeline {

  /** Per-row language + quality scoring, fused into one projection.
    * Exactly the [[TextAnalysis.langId]] and [[TextAnalysis.qualityScore]]
    * math, computed over one staged token array. */
  private def scored(docs: DataFrame): DataFrame = {
    val staged = docs.select(
      col("doc_id"), col("text"),
      length(col("text")).as("n"),
      size(regexp_extract_all(col("text"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
        .as("cjk"),
      tokens(col("text")).as("toks"))
    val counts = TextAnalysis.LangMarkers.map { case (_, ws) =>
      size(filter(col("toks"), t => t.isInCollection(ws))).cast("long")
    }
    val Seq(en, es, de, fr) = counts
    val predLang =
      when(col("cjk") * 10 > col("n") * 3, "zh")
        .when(en + es + de + fr === 0, "und")
        .when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    staged
      .select(col("doc_id"), col("text"), predLang.as("pred_lang"),
        size(col("toks")).cast("long").as("wc"),
        size(array_distinct(col("toks"))).cast("long").as("uniq"),
        size(filter(col("toks"), t => t.isInCollection(TextAnalysis.Stopwords)))
          .cast("long").as("stop"))
      .select(col("doc_id"), col("text"), col("pred_lang"),
        ((least(lit(1000L), col("wc") * 20L)
          + when(col("wc") === 0, 0L).otherwise(expr("(1000 * uniq) div wc"))
          + when(col("wc") === 0, 0L).otherwise(expr("(1000 * stop) div wc")))
          .cast("long")).as("pm_sum"))
      .select(col("doc_id"), col("text"), col("pred_lang"),
        expr("pm_sum div 3").as("quality"))
  }

  /** Funnel report over the pipeline's gates — the yield accounting a
    * curation run publishes: how many docs enter, survive the language
    * gate, survive the quality gate, and remain as distinct content
    * classes after dedup. ONE corpus scan: every stage is a
    * conditional aggregate over the same scored projection (the dedup
    * stage is a `count(DISTINCT digest-if-survivor)`), then `stack`
    * unpivots the four counters into (stage, n_docs) rows. At 100 TB
    * this costs one pass + one distinct-agg shuffle of survivor
    * digests — not four pipeline runs. */
  def curationFunnel(docs: DataFrame, lang: String = "en",
                     minQuality: Int = 400): DataFrame = {
    val s = scored(docs).withColumn("ck",
      sha2(TextAnalysis.normalize(col("text")), 256))
    val langOk = col("pred_lang") === lang
    val qualOk = langOk && col("quality") >= minQuality
    s.select(
        count(lit(1)).as("n0"),
        sum(when(langOk, 1L).otherwise(0L)).as("n1"),
        sum(when(qualOk, 1L).otherwise(0L)).as("n2"),
        count_distinct(when(qualOk, col("ck"))).as("n3"))
      .select(expr(
        """stack(4, '0_input', n0, '1_lang', n1,
          |'2_quality', n2, '3_dedup', n3) AS (stage, n_docs)""".stripMargin))
  }

  /** The full pipeline. Output: one row per SURVIVING document (language
    * match, quality ≥ minQuality, canonical copy of its content class)
    * with its quality, its content class size, and token stats of the
    * redacted text. */
  def trainingPipeline(docs: DataFrame, lang: String = "en",
                       minQuality: Int = 400): DataFrame = {
    val kept = scored(docs)
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
    // ONE pass: the previous groupBy(content_key) + join-back-on-doc_id
    // re-derived the whole lang-id/quality scoring subtree on both
    // sides (Catalyst has no CSE across a self-join — the scoring map
    // work ran twice per rep). A window over content_key computes the
    // same winner rule (min doc_id per digest, copy count) in one
    // content_key shuffle of already-scored rows, scoring the corpus
    // once. Same rows out.
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("content_key")
    kept
      .withColumn("content_key",
        sha2(TextAnalysis.normalize(col("text")), 256))
      .withColumn("n_copies", count(lit(1)).over(byKey))
      .withColumn("win_id", min("doc_id").over(byKey))
      .filter(col("doc_id") === col("win_id"))
      .select(col("doc_id"), col("quality"), col("n_copies"),
        TextAnalysis.redact(col("text")).as("clean"))
      .select(col("doc_id"), col("quality"), col("n_copies"),
        size(tokens(col("clean"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("clean"),
          lit(TextAnalysis.BpeTokenPattern), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        length(col("clean")).cast("long").as("n_chars"))
  }

  /** Curriculum ordering: every document's EXACT global rank by
    * quality (best first) and its contiguous curriculum shard — the
    * export shape for quality-ordered training (easy/clean shards
    * first, tail shards last) and for top-p corpus truncation.
    *
    * The global sort is computed WITHOUT a global single-partition
    * window (the naive `row_number() OVER (ORDER BY …)` funnels the
    * corpus through one task): quality is an integer permille, so
    * (a) the per-score histogram is ≤ 1001 rows — its cumulative
    * "docs strictly better" prefix sum is driver-trivial and
    * broadcast back; (b) within a score bucket, `row_number` over
    * doc_id runs per-bucket, partitions bounded by the largest score
    * class. rank = prefix(better) + within-bucket rank. The same
    * two-phase exact-rank trick as [[Packing.packSequences]]'s prefix
    * sum. If one score value dominates a 100 TB corpus, refine the
    * bucket key with extra score bits (quality is the coarse key
    * here to stay oracle-comparable).
    *
    * Shards are fixed-size contiguous rank ranges (`shardSize` docs),
    * so shard k is exactly ranks [k·size, (k+1)·size) — the property
    * a curriculum loader relies on. */
  def curriculumShards(docs: DataFrame, shardSize: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
    val hist = q.groupBy("quality").agg(count(lit(1)).as("bucket_n"))
    // ≤1001-row window: cumulative count of strictly-better docs
    val prefix = hist
      .withColumn("better",
        coalesce(sum("bucket_n").over(
          Window.orderBy(col("quality").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("quality", "better")
    val within = Window.partitionBy("quality").orderBy("doc_id")
    q.withColumn("bucket_rank", row_number().over(within).cast("long"))
      .join(broadcast(prefix), "quality")
      .select(col("doc_id"), col("quality"),
        (col("better") + col("bucket_rank")).as("rank"))
      .withColumn("shard", expr(s"(rank - 1) div $shardSize"))
  }

  /** Cross-source quality CALIBRATION: a web-crawl doc's quality 600
    * and a curated-source doc's 600 are not the same signal, so
    * mixing sources on the raw score systematically over/under-samples
    * whole sources. The standard fix is rank normalization WITHIN each
    * source: `calib_pm` = the doc's quality percentile (exact integer
    * permille, RANK semantics — ties share, `1000·(rank−1) div (n−1)`,
    * 0 for a single-doc source) among the docs of ITS source. After
    * calibration "keep the top 30% of each source" is the same
    * statement for every source — the per-source twin of
    * [[curriculumShards]]' global rank.
    *
    * Scale shape — NO per-source window (a big source would funnel
    * into one partition): quality is an integer permille, so the
    * (source, quality) histogram is ≤ |sources|·1001 rows; the
    * strictly-lower prefix sum and per-source totals run on the
    * histogram alone, broadcast back, and the per-doc step is a
    * broadcast-join projection. RANK (not row_number) is what makes
    * the histogram sufficient: every doc in a (source, quality) cell
    * shares one calibrated value by definition. */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val hist = q.groupBy("source", "quality").agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy("source").orderBy("quality")
    val cal = hist
      .withColumn("lower", coalesce(sum("n").over(
        bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum("n").over(
        Window.partitionBy("source")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("source"), col("quality"),
        when(col("total") > 1,
          expr("(1000 * lower) div (total - 1)")).otherwise(0L)
          .as("calib_pm"))
    q.join(broadcast(cal), Seq("source", "quality"))
      .select("doc_id", "source", "quality", "calib_pm")
  }
}
