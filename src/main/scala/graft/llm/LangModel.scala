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
  def unigramSurprisal(docs0: DataFrame,
                       keepMaxMillibits: Long = 4030L): DataFrame = {
    // under-split inputs serialize the tokenize+explode map work on one
    // task (guide §2.5; see [[graft.Tables.spread]]) — redistribute once
    val docs = graft.Tables.spread(docs0)
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

  /** Word bigrams of a token array as (w1, w2) struct pairs; empty
    * when the document has fewer than 2 tokens. */
  private def bigramPairs(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1), i =>
        struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))

  /** Conditional (bigram) surprisal with unigram backoff — the
    * held-out upgrade of [[unigramSurprisal]]: the LM trains on one
    * corpus and scores ANOTHER, so unseen events actually occur and
    * the score measures fit, not memorization (the CCNet deployment
    * shape: KenLM trained on Wikipedia, scored on the crawl).
    *
    * Per scored bigram (w1, w2), in whole bits (integer-exact via
    * binary-string length, as everywhere in this file):
    *  - seen bigram: `floor(log2(cnt(w1) div cnt(w1,w2)))` — the
    *    conditional cost of w2 given w1;
    *  - unseen bigram, seen w2: back off to the unigram cost
    *    `floor(log2(N div cnt(w2)))` plus a `penaltyBits` charge
    *    (the integer stand-in for a backoff weight);
    *  - unseen w2 (OOV): `floor(log2(N))` plus the same penalty —
    *    the cost of a singleton under the trained distribution.
    * `n_backoff` / `n_oov` surface how often each branch fired (the
    * train/score domain-mismatch signal). Docs with fewer than 2
    * tokens drop — no bigram to score.
    *
    * Scale shape: both corpora collapse map-side — train to its
    * (w1, w2) and unigram count tables, score to per-doc bigram term
    * frequencies — so the wide joins carry distinct bigrams, not
    * occurrences. The three count joins share the bigram/token keys;
    * `N` rides along as a 1-row broadcast. `uni` is LAZILY persisted
    * (MEMORY_AND_DISK — vocabulary-bounded, slim (token, cnt) rows):
    * it feeds THREE consumers (the w1 join, the w2 join, and the
    * grand total), so the first consumer to run pays the tokenize +
    * aggregate once and the rest read the cache. An EAGER
    * localCheckpoint here (round 12) measured locally identical to
    * both the lazy persist and to no materialization at all
    * (~3.7 s at sf0.1 ×3 reps each), but inserted a synchronous
    * materialization job + block-manager writes inside the timed
    * region — on the shared driver host that job landed in a CPU-
    * starvation window and the query "measured" 18.9 s (round-12
    * post-mortem). Lazy persist keeps the sharing with no extra job. (A
    * measured non-change for the record: dropping the per-doc
    * (doc_id, w1, w2) pre-agg — it deduplicates only 3.5% of rows at
    * sf0.1 — made the query ~25% SLOWER, not faster; the aggregated
    * relation's accurate size stats and partial-agg row reduction
    * beat the saved exchange. The pre-agg stays.) */
  def bigramSurprisal(trainDocs0: DataFrame, scoreDocs0: DataFrame,
                      penaltyBits: Long = 3L,
                      keepMaxMillibits: Long = 4500L): DataFrame = {
    // both corpora pay a heavy per-doc derivation (tokenize + bigram
    // explode) before any shuffle; under-split inputs serialize it on
    // one task (guide §2.5; [[graft.Tables.spread]]). Measured at
    // sf0.1/local[32]: 5.7 → 3.0 s.
    val trainDocs = graft.Tables.spread(trainDocs0)
    val scoreDocs = graft.Tables.spread(scoreDocs0)
    val trainToks = trainDocs
      .select(explode(TextFns.tokens(col("text"))).as("token"))
    val uni = trainToks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // released after the consumer's action — the three consumers all
    // live in the returned lazy plan (see graft.Caches)
    graft.Caches.releaseAfterNextAction(uni)
    val total = uni.agg(sum("cnt").as("n_total"))
    val trainBi = trainDocs
      .select(explode(bigramPairs(TextFns.tokens(col("text")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val scoreTf = scoreDocs
      .select(col("doc_id"),
        explode(bigramPairs(TextFns.tokens(col("text")))).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))
    val bits =
      when(col("c2").isNotNull,
        length(bin(expr("c1_w1 div c2"))) - 1)
        .when(col("c1_w2").isNotNull,
          lit(penaltyBits) + length(bin(expr("n_total div c1_w2"))) - 1)
        .otherwise(lit(penaltyBits) + length(bin(col("n_total"))) - 1)
    scoreTf
      .join(trainBi, Seq("w1", "w2"), "left")
      .join(uni.select(col("token").as("w1"), col("cnt").as("c1_w1")),
        Seq("w1"), "left")
      .join(uni.select(col("token").as("w2"), col("cnt").as("c1_w2")),
        Seq("w2"), "left")
      .join(broadcast(total))
      .select(col("doc_id"), col("tf"), bits.cast("long").as("bits"),
        when(col("c2").isNull && col("c1_w2").isNotNull, col("tf"))
          .otherwise(lit(0L)).as("bk"),
        when(col("c1_w2").isNull, col("tf")).otherwise(lit(0L)).as("ov"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_bigrams"),
        sum(col("tf") * col("bits")).as("total_bits"),
        sum("bk").as("n_backoff"),
        sum("ov").as("n_oov"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        col("n_backoff"), col("n_oov"),
        expr("(1000 * total_bits) div n_bigrams").as("millibits_per_bigram"))
      .withColumn("kept",
        when(col("millibits_per_bigram") <= keepMaxMillibits, 1L)
          .otherwise(0L))
  }

  /** Interpolated Kneser-Ney bigram surprisal — the smoothing KenLM
    * itself uses (Kneser & Ney 1995; Chen & Goodman 1998's
    * interpolated variant), next to [[bigramSurprisal]]'s simpler
    * penalty-backoff: instead of charging a fixed penalty for unseen
    * bigrams, KN discounts every seen bigram by D and hands the
    * collected mass to the CONTINUATION distribution
    * `p_cont(w2) = |{w1 : c(w1,w2) > 0}| / |bigram types|` — "how
    * many contexts does w2 complete" rather than "how often does w2
    * occur" (the classic "San Francisco" effect: "Francisco" is
    * frequent but only ever follows "San", so its continuation
    * probability — and its plausibility after a NOVEL context — is
    * tiny).
    *
    * Exact integer form, discount D = 3/4 kept as the rational 3/4:
    *  - seen bigram (c2 > 0):
    *    `p = (c2 − 3/4)/c1 + (3/4)·(n1a(w1)/c1)·(n1b(w2)/T)`
    *      = `((4·c2 − 3)·T + 3·n1a·n1b) / (4·c1·T)`
    *  - unseen bigram, seen history (n1a(w1) > 0):
    *    `p = (3/4)·(n1a(w1)/c1)·p_cont = 3·n1a·n1b' / (4·c1·T)`
    *  - no usable history (w1 unseen, or never starts a bigram):
    *    `p = p_cont(w2) = n1b'/T`
    * where `n1a(w1) = |{w2 : c(w1,w2)>0}|`, `n1b(w2) = |{w1 :
    * c(w1,w2)>0}|`, `T = |bigram types|`, and `n1b' = coalesce(n1b,
    * 1)` gives a never-seen continuation one type of epsilon mass
    * (the OOV floor; flagged in `n_oov`). Cost per bigram is
    * `floor(log2(den div num))` whole bits via binary-string length —
    * the same integer-exact quantization as the rest of this file.
    *
    * Overflow is GUARDED, not documented away: every numerator and
    * denominator above is ≤ 7·max(c1)·T, so the 1-row stats broadcast
    * asserts `max(c1)·T < 2^61` with `assert_true` — a corpus beyond
    * the bound (top-token count × bigram types ≥ 2.3·10^18; far past
    * any single LM's training set) fails LOUDLY with instructions to
    * shard, instead of wrapping Long arithmetic into silently wrong
    * costs. The DuckDB oracle runs the same Long-domain arithmetic
    * (DuckDB raises on 64-bit overflow rather than wrapping, so
    * inside the guarded domain the two engines are congruent).
    *
    * Scale shape: identical join graph to [[bigramSurprisal]] — both
    * corpora collapse map-side to count tables (`bi` additionally
    * collapses to the two slim continuation-diversity tables, one
    * more map-side agg each); the wide joins carry distinct bigrams;
    * `T`/guard ride a 1-row broadcast. */
  def knSurprisal(trainDocs0: DataFrame, scoreDocs0: DataFrame,
                  keepMaxMillibits: Long = 4500L): DataFrame = {
    // same under-split guard as [[bigramSurprisal]] (guide §2.5) —
    // measured at sf0.1/local[32]: 7.3 → 3.8 s (the two broadcast
    // builds were 1-task stages of ~5 s CPU each, 31 cores idle)
    val trainDocs = graft.Tables.spread(trainDocs0)
    val scoreDocs = graft.Tables.spread(scoreDocs0)
    val uni = trainDocs
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val bi = trainDocs
      .select(explode(bigramPairs(TextFns.tokens(col("text")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // released after the consumer's action (see graft.Caches): `bi`
    // feeds the two continuation tables, the type total, and the
    // score join, all inside the returned lazy plan
    graft.Caches.releaseAfterNextAction(bi)
    val n1a = bi.groupBy("w1").agg(count(lit(1)).as("n1a"))
    val n1b = bi.groupBy("w2").agg(count(lit(1)).as("n1b"))
    // 1-row stats: T with the loud overflow guard FUSED INTO the
    // consumed column (a free-standing assert column would be pruned
    // as dead by the optimizer; coalesce(assert_true(...), 0) + T
    // cannot be — assert_true is NULL on success, fatal on failure)
    val guard = assert_true(
      col("max_c1").cast("double") * col("t_raw").cast("double")
        < lit(math.pow(2.0, 61)),
      lit("kn_surprisal: max(c1)*T >= 2^61 would overflow the " +
        "exact Long arithmetic; shard the LM by corpus slice and " +
        "merge count tables"))
    val stats = bi.agg(count(lit(1)).as("t_raw"))
      .join(uni.agg(max("c1").as("max_c1")))
      .select((coalesce(guard.cast("long"), lit(0L)) + col("t_raw"))
        .as("t_types"))
    val scoreTf = scoreDocs
      .select(col("doc_id"),
        explode(bigramPairs(TextFns.tokens(col("text")))).as("bg"))
      .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))
    val q =
      when(col("c2").isNotNull,
        expr("(4 * c1_w1 * t_types) div ((4 * c2 - 3) * t_types + 3 * n1a * coalesce(n1b, 1))"))
        .when(col("n1a").isNotNull,
          expr("(4 * c1_w1 * t_types) div (3 * n1a * coalesce(n1b, 1))"))
        .otherwise(expr("t_types div coalesce(n1b, 1)"))
    scoreTf
      .join(bi, Seq("w1", "w2"), "left")
      .join(n1a, Seq("w1"), "left")
      .join(uni.select(col("token").as("w1"), col("c1").as("c1_w1")),
        Seq("w1"), "left")
      .join(n1b, Seq("w2"), "left")
      .join(broadcast(stats))
      .select(col("doc_id"), col("tf"),
        (length(bin(q)) - 1).cast("long").as("bits"),
        when(col("c2").isNull, col("tf")).otherwise(lit(0L)).as("bk"),
        when(col("n1b").isNull, col("tf")).otherwise(lit(0L)).as("ov"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_bigrams"),
        sum(col("tf") * col("bits")).as("total_bits"),
        sum("bk").as("n_backoff"),
        sum("ov").as("n_oov"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        col("n_backoff"), col("n_oov"),
        expr("(1000 * total_bits) div n_bigrams").as("millibits_per_bigram"))
      .withColumn("kept",
        when(col("millibits_per_bigram") <= keepMaxMillibits, 1L)
          .otherwise(0L))
  }

  /** The KN continuation-diversity table itself, pinned as a query:
    * per token, occurrence count `c1` vs continuation count `n1b`
    * (distinct left contexts) with the continuation probability in
    * permille — the "Francisco" diagnostic ranking (frequent tokens
    * whose `n1b` is small are exactly the collocation-bound tokens KN
    * reranks). Top-k by occurrence so the report is corpus-size-free;
    * ties broken on the token. */
  def knContinuation(docs: DataFrame, k: Int = 100): DataFrame = {
    // under-split guard (guide §2.5; [[graft.Tables.spread]])
    val toks = graft.Tables.spread(docs)
      .select(TextFns.tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val bi = toks.select(explode(bigramPairs(col("toks"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val n1b = bi.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val t = bi.agg(count(lit(1)).as("t_types"))
    uni
      .join(n1b, uni("token") === n1b("w2"), "left")
      .join(broadcast(t))
      .select(col("token"), col("c1"),
        coalesce(col("n1b"), lit(0L)).as("n1b"),
        expr("(1000 * coalesce(n1b, 0)) div t_types").as("p_cont_pm"))
      .orderBy(col("c1").desc, col("token"))
      .limit(k)
  }

  /** Collocation mining: the corpus's top-k adjacent token pairs by
    * Dice association, `dice_pm = 2000·c(w1,w2) div (c(w1)+c(w2))` —
    * the classic lexicographic collocation measure (Smadja 1993,
    * "Retrieving Collocations from Text: Xtract"), preferred here
    * over PMI because it is a bounded integer permille with NO
    * overflow at any corpus size (PMI's `c12·N/(c1·c2)` ratio needs
    * a float log or an N² intermediate) and it doesn't explode on
    * rare pairs the way PMI does. The phrase-vocabulary signal a
    * tokenizer or stopword-list stage consults.
    *
    * Scale shape: occurrences collapse map-side to the unigram and
    * bigram count tables; the two count joins key on single tokens
    * (one row per key on the build side — hot tokens skew only the
    * probe side, which AQE splits); the final top-k is a
    * TakeOrdered, never a global sort. `minCount` prunes the bigram
    * tail BEFORE the joins. */
  def collocations(docs: DataFrame, minCount: Long = 3L,
                   k: Int = 200): DataFrame = {
    // under-split guard (guide §2.5; [[graft.Tables.spread]])
    val toks = graft.Tables.spread(docs)
      .select(TextFns.tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val bi = toks.select(explode(bigramPairs(col("toks"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bi
      .join(uni.select(col("token").as("w1"), col("cnt").as("c1")), "w1")
      .join(uni.select(col("token").as("w2"), col("cnt").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr("(2000 * c12) div (c1 + c2)").as("dice_pm"))
      .orderBy(col("dice_pm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Distribution drift between two corpus snapshots: the exact L1
    * distance between their unigram distributions, in integer
    * micro-rates — the shift detector a pipeline runs before letting a
    * new crawl batch into the mix (0 = identical distributions;
    * 2,000,000 = disjoint vocabularies). Per-token rates are
    * `(1e6·cnt) div total`, so the statistic is engine-exact and
    * monotone under real drift while rounding error stays ≤ 1 micro
    * per token.
    *
    * Scale: one scan per side collapses to (token, cnt) map-side; the
    * only wide shuffle is the full-outer vocab join on the token key
    * (slim count rows). The two totals ride along as 1-row
    * broadcasts and the output is a single row. */
  def tokenDrift(docsA: DataFrame, docsB: DataFrame): DataFrame = {
    // under-split guard (guide §2.5; [[graft.Tables.spread]])
    def counts(d: DataFrame, side: String) = graft.Tables.spread(d)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(s"cnt_$side"))
    val ca = counts(docsA, "a")
    val cb = counts(docsB, "b")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    joined
      .join(broadcast(joined.agg(sum("cnt_a").as("total_a"),
        sum("cnt_b").as("total_b"))))
      .agg(
        first("total_a").as("n_tokens_a"),
        first("total_b").as("n_tokens_b"),
        sum(when(col("cnt_a") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("cnt_b") > 0, 1L).otherwise(0L)).as("vocab_b"),
        count(lit(1)).as("vocab_union"),
        sum(expr("abs((1000000 * cnt_a) div total_a" +
          " - (1000000 * cnt_b) div total_b)")).as("l1_drift_micro"))
  }

  /** Pairwise unigram-distribution distance between sources: for every
    * source pair (a < b), the exact L1 distance between their unigram
    * micro-rate distributions — the "are these two slices the same
    * kind of text?" matrix a mixing stage consults before collapsing
    * sources into one bucket (0 = identical distributions; 2,000,000 =
    * disjoint vocabularies). Companion of [[tokenDrift]]: that compares
    * two SNAPSHOTS of one corpus, this compares every pair of sources
    * within one snapshot.
    *
    * The pair sum never materializes the vocabulary union: with
    * per-source rate mass `S_x = Σ_tokens rate_x` the identity
    * `L1(a,b) = S_a + S_b − 2·Σ_shared min(rate_a, rate_b)` reduces
    * each pair to its SHARED tokens, so the token-keyed self-join is
    * an inner join on slim (source, token, rate) rows and pairs that
    * share nothing never produce a row at all (impossible between real
    * text sources — any shared stopword keeps the pair). All integer:
    * rates are `(1e6·cnt) div total`, so any engine agrees bit-for-bit.
    *
    * Scale shape: occurrences collapse map-side to (source, token)
    * counts; the self-join fans out each token to the sources sharing
    * it (≤ |sources|² rows per token, |sources| is small); per-source
    * totals and rate masses are |sources|-row broadcasts. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    // under-split guard (guide §2.5; [[graft.Tables.spread]])
    val counts = graft.Tables.spread(docs)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("source").agg(sum("cnt").as("total"))
    val rates = counts.join(broadcast(totals), "source")
      .select(col("source"), col("token"),
        expr("(1000000 * cnt) div total").as("rate"))
    val sums = rates.groupBy("source")
      .agg(sum("rate").as("s_rate"), count(lit(1)).as("vocab"))
    val a = rates.toDF("source_a", "token", "rate_a")
    val b = rates.toDF("source_b", "token", "rate_b")
    a.join(b, Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_vocab"),
        sum(least(col("rate_a"), col("rate_b"))).as("overlap_micro"))
      .join(broadcast(sums.toDF("source_a", "s_a", "vocab_a")), "source_a")
      .join(broadcast(sums.toDF("source_b", "s_b", "vocab_b")), "source_b")
      .select(col("source_a"), col("source_b"),
        col("vocab_a"), col("vocab_b"), col("shared_vocab"),
        col("overlap_micro"),
        (col("s_a") + col("s_b") - lit(2L) * col("overlap_micro"))
          .as("l1_micro"))
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

  /** Epoch plan for a token budget: how many tokens each source
    * contributes under the [[mixtureWeights]] α-temperature shares,
    * and — the data-constrained question (Muennighoff et al. 2023) —
    * how many EPOCHS of each source that implies (`epochs_milli` >
    * 1000 means the trainer will revisit that source's data; the
    * repeat dial a curation run balances against quality). Pure
    * integer arithmetic on the |sources|-row weights frame — the
    * budget never touches the corpus scan. */
  def epochPlan(docs: DataFrame, budgetTokens: Long = 10000000L): DataFrame =
    mixtureWeights(docs)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_pm"),
        expr(s"(${budgetTokens}L * share_pm) div 1000").as("tokens_wanted"),
        expr(s"(1000L * ((${budgetTokens}L * share_pm) div 1000)) div n_tokens")
          .as("epochs_milli"))
}
