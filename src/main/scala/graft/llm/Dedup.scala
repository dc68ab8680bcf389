package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFns._

/** Deduplication operators for a training-data pipeline.
  *
  * Three tiers, all shuffle-bounded (never an all-pairs cartesian):
  *   - exact:   hash-groupBy on a digest of the normalized text;
  *   - MinHash: shingle → signature → LSH band buckets → bucket join →
  *              exact n-gram-Jaccard verify on candidates only;
  *   - SimHash: token-hash sign sums → 32-bit sketch → byte-band
  *              buckets → bucket join → Hamming verify.
  *
  * At 100 TB: the exact pass shuffles one (digest, id) pair per doc —
  * never the text itself. The LSH joins shuffle (band, key, id) tuples;
  * candidate volume is bounded by bucket sizes, and the expensive
  * verification (Jaccard over shingle sets) runs only on distinct
  * candidate pairs, via a join back to the per-doc shingle sets.
  * All hashing is exact integer arithmetic (see [[TextFns]]) so a SQL
  * oracle replays it bit-for-bit.
  */
object Dedup {

  // ---- exact dedup (hash-groupBy) ----

  /** Exact dedup over normalized text: one row per distinct content,
    * keeping the smallest doc_id (deterministic). Groups by a sha256
    * digest, not the text — at scale the shuffle carries 32 bytes + id
    * per row instead of whole documents. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        sha2(TextAnalysis.normalize(col("text")), 256).as("content_key"))
      .groupBy("content_key")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Duplication report by source — where a curation run's exact-dup
    * budget is going (the observability twin of [[exactDedup]]: same
    * digest classes, but instead of dropping rows it attributes every
    * would-be-dropped doc to its source). A doc is "dropped" when it is
    * not the min-id keeper of its global content class — so a source
    * that mirrors another's content shows the loss, not the original.
    * Shuffle shape is the dedup pass itself: (digest, id, source)
    * rows, a digest-keyed self-join, then a tiny per-source rollup. */
  def dedupRateBySource(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
      sha2(TextAnalysis.normalize(col("text")), 256).as("content_key"))
    val keepers = keyed.groupBy("content_key")
      .agg(min("doc_id").as("keep_id"))
    keyed.join(keepers, Seq("content_key"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
          .as("n_dropped"))
      .withColumn("drop_pm", expr("(1000 * n_dropped) div n_docs"))
  }

  /** Which sources mirror each other — the pairwise companion to
    * [[dedupRateBySource]]: for every unordered source pair, how many
    * content classes appear in both (a crawl-overlap matrix; two
    * sources sharing most of their classes are the same feed twice).
    * The (digest, source) relation is distinct'd FIRST, so a class's
    * fan-out in the self-join is bounded by the number of sources —
    * quadratic only in |sources| (tiny), never in copies. */
  def crossSourceOverlap(docs: DataFrame): DataFrame = {
    val ks = docs
      .select(col("source"),
        sha2(TextAnalysis.normalize(col("text")), 256).as("content_key"))
      .distinct()
    ks.select(col("content_key"), col("source").as("src_a"))
      .join(ks.select(col("content_key"), col("source").as("src_b")),
        Seq("content_key"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Corpus with cross-source mirrors: every doc_id ≡ 0 (mod 10) is
    * copied verbatim under doc_id+200000 with source 'mirror' — the
    * fixture behind [[crossSourceOverlap]]'s query. */
  def withMirroredDocs(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text", "source").unionAll(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"),
          lit("mirror").as("source")))

  // ---- MinHash + LSH ----

  /** MinHash parameters: H hashes in B bands of R rows (H = B*R).
    * With shingle size K=3, the LSH S-curve puts the detection knee
    * around Jaccard ≈ (1/B)^(1/R) ≈ 0.7. */
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4
  val ShingleK = 3

  private def hashA(j: Int): Long = Math.floorMod(2654435761L * (j + 1) + 104729L, Prime)
  private def hashB(j: Int): Long = Math.floorMod(97531L * (j + 1) + 12345L, Prime)

  /** MinHash signature of a distinct-shingle-hash array: for each of the
    * H universal-hash functions `(a_j*x + b_j) mod P`, the min over the
    * set. NULL-free: empty shingle sets get signature value P (out of
    * band of any real hash). Planned as the native
    * [[graft.functions.MinHashSigExpression]] (one tight loop instead of
    * H interpreted transform+array_min passes); [[signatureHof]] is the
    * column-form twin for equivalence tests. */
  def signature(shingleHashes: Column): Column =
    graft.functions.SketchExpressions.minhashSigCol(
      shingleHashes, NumHashes, Prime,
      (0 until NumHashes).map(hashA), (0 until NumHashes).map(hashB))

  def signatureHof(shingleHashes: Column): Column =
    array((0 until NumHashes).map { j =>
      coalesce(
        array_min(transform(shingleHashes,
          h => pmod(lit(hashA(j)) * h + lit(hashB(j)), lit(Prime)))),
        lit(Prime))
    }: _*)

  /** Band keys: the R signature values of each band folded into one long
    * (polynomial combine mod P), so a band compares as a single key. */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      (0 until RowsPerBand).foldLeft(lit(0L): Column) { (acc, r) =>
        pmod(acc * 31L + element_at(sig, b * RowsPerBand + r + 1), lit(Prime))
      }
    }: _*)

  /** A-4-style typed-UDAF surface for MinHash (SURVEY §7.4): aggregates
    * a document's shingle hashes into its H-value signature. The buffer
    * is the running element-wise min — `reduce` folds one shingle through
    * all H universal hashes, `merge` is element-wise min, so the
    * aggregation is associative/commutative and map-side combines: at
    * scale each partition ships one H-long buffer per doc, not its
    * shingles. Output equals [[signature]] exactly (tested). */
  object MinHashAgg extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(NumHashes)(Prime)
    def reduce(b: Array[Long], sh: Long): Array[Long] = {
      var j = 0
      while (j < NumHashes) {
        val h = Math.floorMod(hashA(j) * sh + hashB(j), Prime)
        if (h < b(j)) b(j) = h
        j += 1
      }
      b
    }
    def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
      var j = 0
      while (j < NumHashes) { if (r(j) < l(j)) l(j) = r(j); j += 1 }
      l
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** MinHash signatures through the typed-Aggregator path: explode the
    * shingle set to (doc_id, shingle) rows, aggregate per doc. One
    * shuffle of H-long buffers (partial aggregation pre-shuffle). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    shingleSets(docs)
      // explode_outer, deliberately: InferFiltersFromGenerate synthesizes
      // `size(sh) > 0` from a plain explode and predicate pushdown then
      // inlines the whole shingle pipeline into a scan-level filter
      // (measured 25× blow-up). shingleSets already guarantees non-empty
      // arrays, so outer ≡ inner here and no filter is inferred.
      .select(col("doc_id"), explode_outer(col("sh")).as("sh"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .toDF("doc_id", "sig")
      .select(col("doc_id"), posexplode(col("sig")))
      .select(col("doc_id"), col("pos").cast("long").as("j"),
        col("col").as("sig_value"))
  }

  /** doc_id → distinct shingle-hash set. Documents with no shingles
    * (fewer than [[ShingleK]] tokens) are dropped: they have no defined
    * n-gram Jaccard, and keeping them would give every such doc the
    * all-[[Prime]] signature — i.e. all of them colliding in every band
    * and passing the Jaccard filter vacuously at 0/0. */
  def shingleSets(docs: DataFrame, spread: Boolean = true): DataFrame =
    // under-split guard (guide §2.5; [[graft.Tables.spread]]): the
    // token/shingle hashing below is the expensive map-side derivation
    // of the whole MinHash/LSH/set-sim stack, and an under-split input
    // (single-row-group parquet locally; an unsplittable file anywhere)
    // serializes it on one task. No-op whenever the scan already has
    // cores-many slices — incl. every ingest-loop micro-batch, whose
    // file sources are sized files-per-trigger ≥ cores. `spread =
    // false` opts a call site out: [[SetSimJoin.sizedSets]] persists
    // this frame and its consumers re-shuffle by prefix keys anyway, so
    // the extra exchange measured a NET LOSS there (ssjoin_exact
    // 2.73 → 3.32 s, dedup_recall_audit 3.31 → 4.15 s at sf0.1) while
    // the minhash/LSH family measured a win (minhash_dedup 1.12 →
    // 0.81 s, ngram_jaccard_pairs 1.03 → 0.76 s) — each site A/B'd.
    (if (spread) graft.Tables.spread(docs) else docs)
      // equivalent to size(sh) > 0, but checked on the raw token count
      // BEFORE any hashing: a filter on the projected `sh` would be
      // predicate-pushed below the projection, re-inlining the whole
      // shingle expression into the condition (the HOF no-CSE trap —
      // measured as a 20× blow-up)
      .filter(size(tokens(col("text"))) >= ShingleK)
      .select(col("doc_id"), tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"),
        shingleHashSetFromTokenHashes(col("ths"), ShingleK).as("sh"))

  /** doc_id → exploded (band, band_key), SLIM — the shingle set is NOT
    * carried through the band explode: at scale the bucket self-join
    * must shuffle (band, key, id) tuples only, never ×4-replicated
    * shingle arrays. Candidate pairs join back to [[shingleSets]] for
    * verification.
    *
    * Each derived array (token hashes → shingle set → signature) is
    * staged through its own projection so it is materialized once per
    * row; inlining them (e.g. `bandKeys(signature(col("sh")))`) makes
    * every `element_at`/`transform` reference recompute the whole
    * upstream array — Catalyst has no CSE inside higher-order lambdas. */
  def lshBands(sets: DataFrame): DataFrame =
    sets
      .select(col("doc_id"), signature(col("sh")).as("sig"))
      .select(col("doc_id"), posexplode(bandKeys(col("sig"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))

  /** MinHash near-dup pairs: candidates from LSH bucket join, verified
    * with exact n-gram Jaccard ≥ minJaccardPm/1000 (integer
    * cross-multiplied — no float compare). Output one row per pair with
    * the exact intersection/union sizes. */
  def minhashDedup(docs: DataFrame, minJaccardPm: Int = 800): DataFrame =
    minhashDedupFromSets(shingleSets(docs), minJaccardPm)

  /** [[minhashDedup]] from an already-derived (doc_id, sh) sets frame —
    * for callers that have ALREADY paid the corpus's shingle pass
    * ([[graft.llm.SetSimJoin.dedupRecallAudit]] hands over its
    * persisted exact-join sets table, so the recall audit shingles the
    * corpus once instead of once per side). Same math, same rows. */
  def minhashDedupFromSets(sets: DataFrame, minJaccardPm: Int = 800): DataFrame = {
    // Self-join the *same* slim plan (aliases only) — scalar columns
    // through the shuffle; a pair colliding in several bands is deduped
    // BEFORE the Jaccard verification so set-intersection runs once per
    // candidate pair, not once per band collision.
    val bands = lshBands(sets)
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter_size"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("union_size"))
      .filter(col("inter_size") * 1000L >= col("union_size") * minJaccardPm)
  }

  /** Standalone n-gram Jaccard similarity: every LSH-blocked candidate
    * pair with its exact shingle Jaccard in permille (`1000·|∩| div |∪|`,
    * exact integer). [[minhashDedup]] is this with a 0.8 cutoff; the
    * low default here surfaces the similarity *measure* itself (e.g. for
    * tuning a dedup threshold on a new corpus). Blocking via MinHash
    * bands keeps it shuffle-bounded — a direct all-pairs Jaccard is
    * never planned. */
  def ngramJaccardPairs(docs: DataFrame, minJaccardPm: Int = 200): DataFrame =
    minhashDedup(docs, minJaccardPm)
      .withColumn("jaccard_pm", expr("(1000 * inter_size) div union_size"))

  /** Near-dup graph degree histogram: how many partners each document
    * has in the verified pair graph — the index-health gauge that
    * catches hot clusters BEFORE they quadratically explode a bucket
    * join (a boilerplate template shared by 10k pages is one degree-
    * ~10k node here, and the right response — shard it, drop it, or
    * cap the bucket — is a curation decision this report triggers).
    * Shuffle shape: pairs collapse to (doc, degree) with one slim
    * exchange; the histogram then groups ≤|distinct degrees| rows. */
  def dupDegrees(docs: DataFrame, minJaccardPm: Int = 800): DataFrame = {
    val pairs = minhashDedup(docs, minJaccardPm).select("doc_a", "doc_b")
    pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
  }

  /** Near-dup yield curve: how many docs each Jaccard cutoff would
    * remove — the report a curation run reads before committing to a
    * threshold. Pairwise keep-smallest semantics (a doc is removed at
    * cutoff t when some SMALLER-id doc is ≥ t-similar to it); the
    * transitive story is [[dedupClusters]]'s domain. Counts are over
    * LSH-detected pairs, i.e. exact above the banding knee — the
    * region thresholds live in. Shuffle shape: the pair table
    * collapses to one (doc, max-jaccard) row per removable doc, then a
    * |thresholds|-way explode feeds a tiny rollup. */
  def dedupRateCurve(docs: DataFrame,
                     thresholds: Seq[Int] = Seq(500, 600, 700, 800, 900)): DataFrame =
    ngramJaccardPairs(docs)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(max("jaccard_pm").as("max_jpm"))
      .select(col("max_jpm"),
        explode(array(thresholds.map(t => lit(t.toLong)): _*)).as("threshold_pm"))
      .filter(col("max_jpm") >= col("threshold_pm"))
      .groupBy("threshold_pm")
      .agg(count(lit(1)).as("n_docs_removed"))

  /** Safety bound on the CC fixpoint loop: alternating star rounds
    * converge in O(log² n) worst case, so 64 rounds covers any graph
    * that fits on hardware; exceeding it means a bug, not a big graph. */
  val MaxCcRounds = 64

  /** Near-dup CLUSTERS: connected components over the near-dup pair
    * graph, labeling every clustered doc with its component's min doc_id
    * (the canonical keeper — detect → cluster → pick is the full dedup
    * story; dropping `doc_id != canonical_id` rows is the final filter).
    *
    * Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): edges are parent
    * pointers (larger id → smaller id); large-star connects each node's
    * strictly-larger neighbors to its neighborhood min, small-star
    * connects the smaller neighbors and the node itself to it. Each
    * round is two groupBy-min + join passes over the edge set, the edge
    * count never grows, and the fixpoint (one star per component,
    * centered on the component min) arrives in O(log) rounds — a
    * 64-node chain converges in ~5 rounds where min-label propagation
    * (this operator's previous form) took 64 full-graph passes, one per
    * hop of graph diameter. `localCheckpoint` truncates lineage each
    * round; the convergence check (count + exceptAll on the slim
    * checkpointed edge set) is an O(rounds) control decision, not a
    * data collect.
    *
    * NOTE: iterative — building the result DataFrame RUNS the fixpoint
    * (checkpoints + counts), unlike the lazy single-plan operators. */
  def dedupClusters(pairs: DataFrame): DataFrame =
    dedupClustersWithRounds(pairs)._1

  /** [[dedupClusters]] plus the number of star rounds the fixpoint took
    * (exposed for convergence tests). */
  private[llm] def dedupClustersWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    val p = pairs.select("doc_a", "doc_b").localCheckpoint(true)
    // canonical parent-pointer edges: larger id → smaller id.
    // localCheckpoint is LAZY here and everywhere in the loop: the
    // count() that immediately follows materializes the checkpoint in
    // the same job, so each round costs one pass, not two.
    var e = p
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    var eCount = e.count()
    var converged = eCount == 0
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= MaxCcRounds,
        s"connected components did not converge in $MaxCcRounds star rounds")
      // large-star over the symmetric view: for each node u, attach its
      // larger neighbors to m = min(Γ(u) ∪ {u}); every emitted edge has
      // v > u ≥ m, so the output is canonical by construction
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val lsMins = sym.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u").as("mu"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(lsMins, col("u") === col("mu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star on the canonical edges: attach the smaller neighbors
      // and u itself to m = min(Γ(u) ∪ {u}) = min of the (all-smaller)
      // neighbor set
      val ssMins = ls.groupBy("u").agg(min("v").as("m"))
        .select(col("u").as("su"), col("m"))
      val ssJoined = ls.join(ssMins, col("u") === col("su"))
      val next = ssJoined
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(ssJoined.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false) // materialized by the count below

      // fixpoint ⟺ identical edge set: same cardinality and no novel
      // edge (both sides are distinct'd, so one-direction except + count
      // equality is full set equality)
      val nextCount = next.count()
      converged = nextCount == eCount && next.exceptAll(e).head(1).isEmpty
      e = next
      eCount = nextCount
    }
    // converged: one star per component, centered on the component min;
    // centers label themselves
    val nodes = p.select(col("doc_a").as("id"))
      .unionAll(p.select(col("doc_b").as("id")))
      .distinct()
    val labels = nodes.join(e, nodes("id") === e("u"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("v"), col("id")).as("canonical_id"))
    (labels, rounds)
  }

  /** Leakage-safe train/val/test assignment: split by NEAR-DUP CLUSTER,
    * not by document — if two near-duplicate docs landed in train and
    * test, the eval split would leak (the model has effectively seen
    * the test doc), which per-doc random splits silently do. Every doc
    * maps to its cluster canonical ([[dedupClusters]]; singletons are
    * their own canonical) and the split is a deterministic integer
    * hash of the CANONICAL id bucketed to permilles — so cluster
    * membership implies identical split, by construction rather than
    * by audit. Defaults: 900/50/50 train/val/test.
    *
    * The multiplier-hash reduces the id mod 1000003 FIRST so the
    * product stays far inside 63 bits at any id scale — engines that
    * error on overflow (rather than wrap) agree with engines that
    * wrap. Scale shape: clusters come from the star fixpoint (edge-set
    * bounded); the doc-side is one slim left join on doc_id and a
    * stateless projection. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       valPm: Long = 50L, testPm: Long = 50L): DataFrame = {
    val clusters = dedupClusters(pairs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("bucket",
        expr("((canonical_id % 1000003) * 2654435761) % 1000"))
      .withColumn("split",
        when(col("bucket") < lit(1000L - valPm - testPm), "train")
          .when(col("bucket") < lit(1000L - testPm), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("canonical_id"), col("split"))
  }

  // ---- SimHash ----

  val SimHashBits = 32
  val ByteBands = 4 // 4 bands of 8 bits

  /** 32-bit SimHash from a *materialized* token-hash array column: bit j
    * is the sign of `sum over tokens of (bit_j(hash) ? +1 : -1)` —
    * occurrence-weighted (classic SimHash). `ths` must be an attribute
    * (see [[TextFns.shingleHashSetFromTokenHashes]]): the 32 per-bit
    * votes each scan it. Note: on a corpus with a shared small
    * vocabulary, sketches genuinely cluster (documents ARE similar as
    * bags of words) — banding bounds the join but candidate counts track
    * the real similarity structure. */
  def simhashFromTokenHashes(ths: Column): Column =
    graft.functions.SketchExpressions.simhashCol(ths, SimHashBits)

  /** Column-form twin of [[simhashFromTokenHashes]] for tests. */
  def simhashFromTokenHashesHof(ths: Column): Column =
    (0 until SimHashBits).foldLeft(lit(0L): Column) { (acc, j) =>
      val vote = aggregate(ths, lit(0L),
        (a, h) => a + when(pmod(shiftright(h, j), lit(2L)) === 1L, 1L).otherwise(-1L))
      acc + when(vote >= 0, lit(1L << j)).otherwise(0L)
    }

  /** SimHash near-dup pairs: candidates share at least one of the 4
    * byte-wide bands; verified with Hamming distance ≤ maxHamming.
    *
    * The band self-join runs on DISTINCT sketches, not documents, so
    * the Hamming verify happens once per sketch pair regardless of how
    * many docs share each sketch. On a clustered corpus this collapses
    * the candidate space (measured sf0.1: 5 500 docs → 2 610 sketches,
    * 18.8M doc-pair band collisions → ~0.5M sketch-pair collisions).
    * Equivalent output: a doc's bands are a function of its sketch, so
    * doc-level band collision ⟺ sketch-level collision.
    *
    * Doc-pair expansion is pure JOIN expansion — verified sketch pairs
    * join back to the slim (sh, doc_id) relation on each side, and
    * same-sketch pairs come from an equi-self-join. No row ever holds a
    * group's id list (the earlier `collect_list` design put a hot
    * sketch's entire doc-id set into ONE row — unbounded single-row
    * state; a boilerplate-heavy corpus at 100 TB does produce
    * million-doc identical-sketch classes). A hot sketch is now just a
    * hot join key: its pairs are emitted streaming from the join probe,
    * and AQE's skew-join split can shard it across tasks. The sketch
    * projection is recomputed per consumer — stateless, scan-bound, the
    * standard trade for keeping the operator a single lazy plan. */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sketched = docs
      .select(col("doc_id"), tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"), simhashFromTokenHashes(col("ths")).as("sh"))
      // a NULL text ⇒ NULL sketch; band and self-joins drop NULL keys —
      // the filter keeps that explicit (and prunes before any shuffle)
      .filter(col("sh").isNotNull)
    val bands = sketched.select("sh").distinct().select(
      col("sh"),
      posexplode(array((0 until ByteBands).map { b =>
        pmod(shiftright(col("sh"), 8 * b), lit(256L))
      }: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val shPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.sh") < col("b.sh"))
      .select(col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    val cross = shPairs
      .join(sketched.select(col("sh").as("sh_a"), col("doc_id").as("id_a")), "sh_a")
      .join(sketched.select(col("sh").as("sh_b"), col("doc_id").as("id_b")), "sh_b")
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("hamming"))
    val same = sketched.as("x")
      .join(sketched.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(same)
  }

  // ---- decontamination ----

  /** Benchmark decontamination: training docs (doc_id ≥ evalMaxId) that
    * share at least one [[ShingleK]]-gram with the eval set
    * (doc_id < evalMaxId), with the count of shared distinct shingles —
    * the hygiene pass that keeps test sets out of training data.
    *
    * Scale shape: the eval shingle set is small by definition (eval
    * sets are thousands of docs, not billions) and BROADCASTS; the
    * training side streams through the broadcast hash join exploded to
    * (doc_id, shingle) rows and only matching rows reach the per-doc
    * count (partial-aggregated). The training corpus never shuffles its
    * text or its full shingle sets. */
  def contamination(docs: DataFrame, evalMaxId: Long = 20L): DataFrame = {
    val sets = shingleSets(docs)
    // explode_outer: sets guarantees non-empty arrays, and plain explode
    // would let InferFiltersFromGenerate re-inline the shingle pipeline
    // into a scan filter (the same trap as minhashSignatures)
    val train = sets.filter(col("doc_id") >= evalMaxId)
      .select(col("doc_id"), explode_outer(col("sh")).as("shingle"))
    val evalSh = sets.filter(col("doc_id") < evalMaxId)
      .select(explode_outer(col("sh")).as("shingle"))
      .distinct()
    train
      .join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Bloom-filter decontamination parameters: a [[BloomBits]]-bit filter
    * (packed into 64-bit words) probed with [[BloomHashes]] positions per
    * shingle. Position hashes reuse the MinHash permutation constants
    * (`sigE` in the oracle): pos_j = ((a_j·h + b_j) mod P) mod m. */
  val BloomBits = 32768L
  val BloomHashes = 3

  private def bloomPos(h: Column, j: Int): Column = {
    val a = (2654435761L * (j + 1) + 104729L) % Prime
    val b = (97531L * (j + 1) + 12345L) % Prime
    pmod(pmod(lit(a) * h + lit(b), lit(Prime)), lit(BloomBits))
  }

  /** [[contamination]]'s no-broadcast scale path: the eval set is folded
    * into a FIXED-SIZE Bloom filter and only the filter ships to the
    * executors. [[contamination]] broadcasts the raw eval shingle set —
    * fine for eval sets of thousands of docs, impossible when the
    * "contamination source" is itself web-scale (e.g. decontaminating
    * crawl B against crawl A). Here the eval side collapses to
    * [[BloomBits]]/64 packed words via a `bit_or` aggregate — ~4 KB
    * broadcast no matter how many billions of eval shingles went in —
    * and a training shingle is flagged when all [[BloomHashes]] probed
    * bits are set.
    *
    * The price is bounded false positives (a shingle whose probe
    * positions are all covered by OTHER shingles' bits): with fill
    * ratio f the FP rate is f^k. Both engines compute the identical
    * filter, so the oracle reproduces even the false positives
    * bit-for-bit — `n_flagged_shingles` here is ≥ the exact operator's
    * `n_shared_shingles` by construction, never less.
    *
    * Shuffle shape: eval shingles partial-aggregate into ≤ m/64 words
    * map-side (the `bit_or` groups by word index); the training side
    * streams through a broadcast join on word index exactly like the
    * exact operator, text and shingle sets never shuffle. */
  /** (doc_id, shingle, pos) probe rows of a [[shingleSets]] frame;
    * explode_outer for the same InferFiltersFromGenerate reason as
    * [[contamination]]. */
  private def bloomPositions(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), explode_outer(col("sh")).as("shingle"))
      .select(col("doc_id"), col("shingle"),
        explode(array((0 until BloomHashes)
          .map(j => bloomPos(col("shingle"), j)): _*)).as("pos"))

  /** The Bloom filter of a corpus' shingles as packed 64-bit words —
    * `bit_or` of single-bit contributions grouped by word index, at
    * most [[BloomBits]]/64 rows regardless of corpus size. */
  def bloomWords(docs: DataFrame): DataFrame =
    bloomPositions(shingleSets(docs))
      .groupBy(expr("pos div 64").as("word_idx"))
      .agg(bit_or(expr("shiftleft(1L, int(pmod(pos, 64)))")).as("word"))

  def bloomContamination(docs: DataFrame, evalMaxId: Long = 20L): DataFrame = {
    val sets = shingleSets(docs)
    val words = bloomWords(docs.filter(col("doc_id") < evalMaxId))
    bloomPositions(sets.filter(col("doc_id") >= evalMaxId))
      .join(broadcast(words), expr("pos div 64") === col("word_idx"))
      .filter(col("word").bitwiseAND(
        expr("shiftleft(1L, int(pmod(pos, 64)))")) =!= 0L)
      // a shingle is flagged only when ALL k probed bits are set; `pos`
      // rows carry distinct j, so the hit count per (doc, shingle) is
      // the number of probes that found their bit
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") === BloomHashes.toLong)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_flagged_shingles"))
  }

  /** The filter as a dense `Array[Long]` of [[BloomBits]]/64 words —
    * the form that ships to executors as a literal. The collect here is
    * bounded by the PARAMETER m (512 longs = 4 KB), never by data: for
    * a Bloom filter, materializing the bit array IS the broadcast (the
    * same role as broadcasting a trained model), and it is what makes a
    * fully STATELESS streaming membership test possible
    * ([[graft.streaming.DocStream.decontaminationGate]]). */
  def bloomFilterArray(docs: DataFrame): Array[Long] = {
    val arr = new Array[Long]((BloomBits / 64).toInt)
    bloomWords(docs).collect().foreach { r =>
      arr(r.getAs[Long]("word_idx").toInt) = r.getAs[Long]("word")
    }
    arr
  }

  /** Row-level contamination predicate of a SHINGLE-SET column (stage
    * [[shingleSets]]'s projections first — the HOF no-CSE trap) against
    * a materialized Bloom word array: true iff ANY shingle has all
    * [[BloomHashes]] probed bits set. Pure projection — no join, no
    * aggregation, no state — so it runs unchanged on a stream. A doc
    * with fewer than [[ShingleK]] tokens has an empty set and is never
    * flagged (vacuously clean, matching [[bloomContamination]]'s
    * domain). */
  def bloomContaminated(sh: Column, filterWords: Array[Long]): Column = {
    val words = typedLit(filterWords.toSeq)
    exists(sh, s =>
      (0 until BloomHashes).map { j =>
        val p = bloomPos(s, j)
        val word = element_at(words,
          floor(p.cast("double") / 64d).cast("int") + 1)
        word.bitwiseAND(shiftleftCol(lit(1L),
          pmod(p, lit(64L)).cast("int"))) =!= 0L
      }.reduce(_ && _))
  }

  /** [[bloomContaminated]] from the TOKEN-HASH array, as the native
    * [[graft.functions.BloomShingleHitExpression]] — shingle combine
    * and Bloom probes in one generated loop, the child evaluated
    * exactly once per row. This is the form a FILTER must use: the
    * column twin above depends on its shingle-set argument being a
    * staged attribute, and predicate pushdown un-stages it (re-inlining
    * the token-hash expression into every `element_at` of the shingle
    * lambda — measured 23× on the streaming gate). Bit-identical to
    * `bloomContaminated(shingleHashSetFromTokenHashes(ths, ShingleK), words)`
    * (DedupSpec pins it). */
  def bloomContaminatedFromTokenHashes(ths: Column, filterWords: Array[Long]): Column =
    graft.functions.SketchExpressions.bloomShingleHitCol(
      ths, ShingleK, Prime, BloomBits, BloomHashes, filterWords.toSeq)

  /** `shiftleft` with a COLUMN bit count (the Scala API only takes a
    * literal Int; the Catalyst node takes any expression). */
  private def shiftleftCol(v: Column, bits: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.GraftColumnBridge.expression(v),
        org.apache.spark.sql.GraftColumnBridge.expression(bits)))

  // ---- snapshot delta ----

  /** Snapshot B of the corpus for [[corpusDelta]]'s fixture: docs with
    * doc_id ≡ 3 (mod 7) dropped, docs with doc_id ≡ 0 (mod 5) edited
    * (a version suffix), and new docs under id −doc_id−1 for
    * doc_id ≡ 0 (mod 11) — the negative id space is disjoint from any
    * real (non-negative) doc_id at every scale factor, so snapshot B
    * never carries a duplicate key and the delta categories always
    * partition the corpus. */
  def withSnapshotB(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(11)) === 0)
        .select((-col("doc_id") - 1L).as("doc_id"), col("text")))

  /** Incremental-crawl accounting: compare two corpus snapshots by
    * doc_id and report how many docs were added / removed / changed /
    * unchanged — the delta report that decides whether a recrawl is
    * worth a full re-curation pass. Each side collapses to
    * (doc_id, digest) before the full-outer join, so the shuffle
    * carries 40 bytes per doc regardless of document size; the rollup
    * is a 4-row aggregate. */
  def corpusDelta(a: DataFrame, b: DataFrame): DataFrame = {
    def keyed(df: DataFrame, name: String) =
      df.select(col("doc_id"),
        sha2(TextAnalysis.normalize(col("text")), 256).as(name))
    keyed(a, "dig_a").join(keyed(b, "dig_b"), Seq("doc_id"), "full_outer")
      .select(
        when(col("dig_a").isNull, "added")
          .when(col("dig_b").isNull, "removed")
          .when(col("dig_a") =!= col("dig_b"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy("change").agg(count(lit(1)).as("n_docs"))
  }

  // ---- chunk-level cross-document dedup ----

  /** Sub-document dedup — the "repeated line removal" pass (à la
    * C4/RefinedWeb boilerplate stripping) for a corpus whose documents
    * have no line structure: documents are cut into deterministic
    * fixed-size token chunks ([[TextAnalysis.chunkDocs]], zero overlap
    * so chunks tile the doc), and a chunk whose hash occurs in
    * [[minDocs]]+ DISTINCT documents is boilerplate. Per doc: total
    * chunks, boilerplate chunks, and the token count that survives
    * dropping them — the curation accounting a pipeline needs before
    * committing to a rewrite pass.
    *
    * Scale shape: chunk TEXT never shuffles — the per-chunk projection
    * reduces each chunk to a (hash, doc_id, n_tokens) triple. The
    * distinct-doc count per hash is a two-level hash aggregate
    * ((hash, doc_id) distinct, then count per hash), the boilerplate
    * verdict joins back on the slim hash key, and the final per-doc
    * rollup partial-aggregates. A hot boilerplate chunk (the classic
    * cookie-banner-in-a-billion-docs) is ONE row after the distinct's
    * partial aggregation — the skew lands on the bounded hash-count
    * side, not on a replicated text blob. */
  def chunkDedup(docs: DataFrame, chunkSize: Int = 32,
                 minDocs: Long = 2L): DataFrame = {
    val chunks = TextAnalysis.chunkDocs(docs, chunkSize, overlap = 0)
      .select(col("doc_id"), polyHash(col("chunk_text")).as("ch"),
        col("chunk_tokens"))
    val boiler = chunks.select(col("ch"), col("doc_id")).distinct()
      .groupBy("ch").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("ch"), lit(true).as("boiler"))
    chunks.join(boiler, Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boilerplate"),
        sum(when(col("boiler"), 0L).otherwise(col("chunk_tokens")))
          .as("kept_tokens"))
  }

  // ---- exact substring dedup (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better") ----

  /** Every k-token rolling window of every doc, stride 1:
    * (doc_id, pos, whash) with pos the 1-based token offset. The
    * window hashes come from the native O(n)-rolling
    * [[graft.functions.WindowHashesExpression]] (a HOF refold is
    * O(n·k) interpreted lambdas); docs with fewer than k tokens have
    * no window and contribute no rows. Cost note, honestly: stride-1
    * windows mean roughly ONE OUTPUT ROW PER CORPUS TOKEN — this is
    * the Spark analog of the suffix-array pass in the paper, and its
    * shuffle is corpus-token-sized by construction (slim: two longs
    * and an int per row). [[chunkDedup]] is the cheap non-overlapping
    * sibling when that cost is not warranted. */
  def windowHashRows(docs: DataFrame, k: Int = SpanK): DataFrame =
    docs
      .filter(size(tokens(col("text"))) >= k)
      .select(col("doc_id"), tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"),
        posexplode(graft.functions.SketchExpressions
          .windowHashesCol(col("ths"), k, Prime)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("whash"))

  /** Default substring-dedup window: 8 tokens — long enough that an
    * organic 8-gram collision across docs is rare, short enough to
    * catch license headers / navigation chrome / injected footers. */
  val SpanK = 8

  /** Maximal repeated spans: token ranges [span_start, span_end]
    * (1-based, inclusive) covered by k-windows whose hash occurs in at
    * least `minDocs` DISTINCT docs. Overlapping and adjacent repeated
    * windows merge into one span (classic island detection: a window
    * starting more than k past its predecessor opens a new island —
    * implemented as a running sum over the per-doc position order, so
    * the only corpus-sized shuffles are the count-distinct aggregate
    * and the per-doc window, both on slim rows). The repeated-window
    * set is NOT broadcast: boilerplate-heavy corpora make it
    * arbitrarily large, so the hash join shuffles (whash, id, pos) —
    * slim by design. */
  def repeatedSpans(docs: DataFrame, k: Int = SpanK,
                    minDocs: Long = 2L): DataFrame = {
    // the rolling-hash derivation feeds BOTH the repeated-window
    // aggregate and the hits join (no CSE across branches) — persist
    // the slim (doc_id, pos, whash) rows so the tokenize + window-hash
    // scan runs once per query, released after the caller's action
    val wh = windowHashRows(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.Caches.releaseAfterNextAction(wh)
    val rep = wh.select(col("whash"), col("doc_id")).distinct()
      .groupBy("whash").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("whash")
    val hits = wh.join(rep, Seq("whash")).select("doc_id", "pos")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("prev", lag("pos", 1).over(byDoc))
      .withColumn("newspan",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum("newspan").over(
        byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("span_start"),
        (max("pos") + (k - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** The curation signal substring dedup exists for: per doc, the
    * fraction (permille, exact integer) of token positions covered by
    * repeated spans. 1000 = the whole doc is boilerplate/duplicated
    * text (an exact-dup pair scores 1000 on both sides); docs with no
    * repeated span — including sub-k-token docs — score 0. Merged
    * spans are disjoint by construction, so coverage is a plain sum. */
  def repeatedTokenFraction(docs: DataFrame, k: Int = SpanK,
                            minDocs: Long = 2L): DataFrame = {
    val cov = repeatedSpans(docs, k, minDocs)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1L).as("covered"))
    docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (coalesce(col("covered"), lit(0L)) * 1000L)
          .divide(greatest(col("n_tokens"), lit(1L))).cast("long")
          .as("repeated_pm"))
  }

  /** The transform the span detection feeds: each doc's text with its
    * repeated spans excised (whitespace-normalized — tokens rejoin with
    * single spaces, the same normalization every hash in this module
    * already applies). Spans arrive as a per-doc array via one slim
    * groupBy (a doc has few spans), and the excision itself is a
    * per-row lambda over the token array — no token-level shuffle, so
    * the only corpus-token-sized cost stays inside [[repeatedSpans]].
    * Docs with no spans pass through verbatim-after-normalization;
    * `removed_tokens` makes the cut auditable. */
  def stripRepeatedSpans(docs: DataFrame, k: Int = SpanK,
                         minDocs: Long = 2L): DataFrame = {
    val spansByDoc = repeatedSpans(docs, k, minDocs)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    docs
      .join(spansByDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), tokens(col("text")).as("toks"), col("spans"))
      .select(col("doc_id"),
        when(col("spans").isNull, col("toks")).otherwise(
          filter(col("toks"), (_, i) => !exists(col("spans"),
            s => (i + 1) >= s.getField("span_start") &&
              (i + 1) <= s.getField("span_end")))).as("kept"),
        size(col("toks")).cast("long").as("n_tokens"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("removed_tokens"))
  }

  /** N-GRAM decontamination (Brown et al. 2020, GPT-3 Appendix C):
    * flag every TRAINING document that shares at least one k-token
    * window with the EVAL set — the published 13-gram rule, the
    * n-gram-granular sibling of the exact/Bloom decontamination gates
    * (which only catch whole-document matches). Eval membership is the
    * deterministic split doc_id ≡ 7 (mod 100); per flagged training
    * doc: how many of its window positions are dirty and how many
    * distinct eval docs it collides with — the audit columns that
    * separate a verbatim leak (many windows, one eval doc) from a
    * shared boilerplate phrase (few windows, many eval docs).
    *
    * Scale shape: both sides reuse [[windowHashRows]]'s slim
    * (doc_id, pos, whash) rows — raw text never shuffles. The join is
    * hash-equi on whash with the DISTINCT eval side; in production the
    * eval set is tiny (AQE broadcasts it), but nothing here requires
    * that. Cost is one corpus-token-sized window pass, the same bound
    * as [[repeatedSpans]].
    *
    * The driver corpus shares no organic 13-grams, so contamination is
    * INJECTED deterministically ([[withEvalLeak]]): a 17-token canary
    * appended to every eval doc AND to training docs ≡ 5 (mod 11) —
    * those leak 5 windows each (17−13+1), which the oracle hash pins
    * exactly. */
  def ngramDecontamination(docs: DataFrame, k: Int = 13): DataFrame = {
    val w = windowHashRows(withEvalLeak(docs), k)
    val evalW = w.filter(pmod(col("doc_id"), lit(100)) === 7)
      .select(col("whash"), col("doc_id").as("eval_id")).distinct()
    val trainW = w.filter(pmod(col("doc_id"), lit(100)) =!= 7)
    trainW.join(evalW, Seq("whash"))
      .groupBy("doc_id")
      .agg(countDistinct(col("pos")).as("n_dirty_windows"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Corpus with an injected eval-set leak for [[ngramDecontamination]]:
    * a 17-token canary appended to every eval doc (doc_id ≡ 7 mod 100)
    * and to the training docs that are "contaminated" (≡ 5 mod 11). */
  def withEvalLeak(docs: DataFrame): DataFrame = {
    val leak = " canary benchmark passage held out for evaluation" +
      " integrity audit number forty two of the held out suite"
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(100)) === 7 ||
          pmod(col("doc_id"), lit(11)) === 5,
        concat(col("text"), lit(leak))).otherwise(col("text")).as("text"))
  }

  /** Corpus with injected sub-document BOILERPLATE: every doc_id ≡ 3
    * (mod 7) gets a fixed 16-token footer appended — the repeated-span
    * shape (license header / site chrome) that whole-doc and
    * chunk-level dedup both miss — plus the usual verbatim +100000
    * copies of doc_id ≡ 0 (mod 10), whose every window repeats. */
  def withBoilerplate(docs: DataFrame): DataFrame = {
    val footer = " standard footer boilerplate notice appended to" +
      " every seventh document for compliance review purposes under" +
      " policy nine"
    val based = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 3,
        concat(col("text"), lit(footer))).otherwise(col("text")).as("text"))
    based.unionAll(
      based.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
  }

  // ---- duplicate-injection fixtures ----

  /** Corpus with injected EXACT duplicates: every doc_id ≡ 0 (mod 10) is
    * copied verbatim under doc_id+100000 (`extra` columns carried
    * through onto the copy). */
  def withExactDups(docs: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val kept = extra.map(col)
    docs.select(Seq(col("doc_id"), col("text")) ++ kept: _*).unionAll(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(Seq((col("doc_id") + 100000L).as("doc_id"),
          col("text")) ++ kept: _*))
  }

  /** Corpus with injected NEAR duplicates: every doc_id ≡ 0 (mod 10) is
    * copied with one prepended token (shingle Jaccard ≈ 0.9 for typical
    * lengths). */
  def withNearDups(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text").unionAll(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("dup "), col("text")).as("text")))
}
