package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import TextFns._

/** BPE tokenizer TRAINING and APPLICATION as distributed dataflow:
  * learn the top byte-pair (here: character-pair) merges of the
  * corpus, then encode documents with them — the tokenizer-lifecycle
  * half next to [[TextAnalysis.encodeDocs]] (which applies a
  * word-level vocabulary).
  *
  * Classic formulation (Sennrich et al. 2016): operate on the WORD
  * COUNT table, not the raw corpus — each word is a symbol sequence
  * seeded with its characters, and every round (a) counts adjacent
  * symbol pairs weighted by word frequency, (b) picks the most
  * frequent pair (count desc, then lexicographic — deterministic), and
  * (c) rewrites every word's sequence merging that pair left-to-right
  * non-overlapping.
  *
  * Scale shape: the corpus-sized work is the ONE `groupBy(token)`
  * building word counts (a shuffle of (token, count) partials); every
  * merge round after that is bounded by the VOCABULARY — pair counting
  * is a hash aggregate over ≤ |vocab|·maxlen slim rows, the best pair
  * is a `TakeOrderedAndProject` limit-1 (never a full sort), and the
  * rewrite is a stateless projection with the pair inlined as
  * LITERALS. At 100 TB the rounds cost the same as at 100 GB.
  *
  * Merge budget scaling (a real tokenizer runs thousands of rounds,
  * not 3): each round's best pair is harvested EAGERLY — a bounded
  * 1-row collect per round, the distributed analog of the classic
  * algorithm's sequential merge loop — so the learned merges live on
  * the driver as plain values and [[merges]] is a flat parallelized
  * table instead of a union of `rounds` lazy plans sharing ever-longer
  * lineage prefixes (which replayed O(rounds²) work). The word table
  * is cut from the corpus lineage immediately after the one
  * corpus-sized aggregate and re-materialized via `localCheckpoint`
  * every [[CheckpointEvery]] rounds, so plan depth is bounded by a
  * CONSTANT (≤ CheckpointEvery stateless projections over a
  * vocab-sized leaf) no matter the budget — rounds=64 plans as flat
  * as rounds=3 (BpeSpec pins this). Application ([[encode]]) is one
  * corpus scan joined against the final (token → symbol count) table
  * — no per-round work at all.
  *
  * The rewrite fold is back-looking — append each symbol unless the
  * accumulator's last symbol is `lhs` and the current is `rhs`, in
  * which case replace the last with the merge. This is provably
  * identical to the left-to-right scan (a merged symbol `lhs·rhs` can
  * never equal `lhs`, so a fresh merge is never itself extended), and
  * both Spark's `aggregate` HOF and DuckDB's `list_reduce` express it
  * with identical semantics — the oracle replays every round
  * bit-for-bit.
  */
object Bpe {

  /** Rounds between word-table re-materializations. Between
    * checkpoints the table accrues one stateless mergeFold projection
    * per round (replayed by later rounds in the window — O(k²) in the
    * WINDOW size, constant overall); at the checkpoint the lineage
    * collapses to a vocab-sized leaf. 8 keeps both the replay window
    * and the plan depth small without a materialization job per round. */
  private val CheckpointEvery = 8

  /** One learned merge rule, harvested on the driver — the unit of the
    * train-once/apply-many lifecycle: [[learn]] produces them,
    * [[encodeWith]] replays them on ANY corpus. */
  final case class MergeRule(
    round: Int, lhs: String, rhs: String, pairCnt: Long)

  /** Train `rounds` merges: the harvested rules (possibly fewer than
    * `rounds` when the corpus exhausts its learnable pairs — every
    * word a single symbol) plus the FINAL word table
    * (token, cnt, syms) after all rewrites, so [[encode]] can reuse it
    * instead of re-aggregating the corpus and re-applying the merges.
    *
    * Checkpoint durability: `localCheckpoint` stores the truncated
    * lineage's blocks on executor/driver storage — NOT reliable
    * storage — so losing an executor mid-training fails the job
    * instead of recomputing (the pure-lineage fold could replay, at
    * O(rounds²) cost). That is the right local-mode trade; a cluster
    * run that must survive executor loss passes
    * `reliableCheckpoint = true` to use `Dataset.checkpoint` against
    * `spark.sparkContext.setCheckpointDir` (HDFS/object store) — same
    * truncation, durable blocks, one extra write per
    * [[CheckpointEvery]] rounds of a vocab-sized table. */
  def learn(docs: DataFrame, rounds: Int,
            reliableCheckpoint: Boolean = false): (Vector[MergeRule], DataFrame) = {
    require(rounds >= 1, "need at least one merge round")
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(false) else df.localCheckpoint(false)
    // The ONLY corpus-sized step. localCheckpoint (eager=false: the
    // round-1 harvest below materializes it) cuts the corpus lineage
    // so no later round's plan reaches back to the raw scan, and keeps
    // the vocab-sized table resident for the per-round re-scans.
    // spread unlocks map-side parallelism for the tokenize/explode/
    // partial-agg (guide §2.5; the r17 LangModel precedent): on the
    // driver-layout single-file table this pass otherwise runs as ONE
    // task; identity on production multi-split layouts
    var w = cut(graft.Tables.spread(docs.select(col("text")))
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .select(col("token"), col("cnt"), chars(col("token")).as("syms")))
    val learned = Vector.newBuilder[MergeRule]
    var sinceCheckpoint = 0
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // (lhs, rhs, pair_cnt) over adjacent symbol pairs weighted by
      // word count; best = limit-1 under (count desc, lexicographic)
      val best: Array[Row] = w
        .select(col("cnt"),
          explode_outer(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r"))))).as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum("cnt").as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("lhs"), col("rhs")).limit(1)
        .collect() // bounded: exactly ≤1 row per round
      if (best.isEmpty) exhausted = true // no pairs left; remaining rounds are identity
      else {
        val (lhs, rhs) = (best(0).getString(0), best(0).getString(1))
        learned += MergeRule(round, lhs, rhs, best(0).getLong(2))
        w = w.select(col("token"), col("cnt"),
          mergeFold(col("syms"), lit(lhs), lit(rhs)).as("syms"))
        sinceCheckpoint += 1
        if (sinceCheckpoint >= CheckpointEvery) {
          // superseded checkpoints are not manually unpersisted: once
          // this reassignment drops the last reference to the previous
          // checkpointed plan, Spark's ContextCleaner reclaims its
          // blocks after GC — and an eager unpersist BEFORE the new
          // (lazy) checkpoint materializes would destroy the only copy
          // of the data its lineage-truncated plan reads from
          w = cut(w)
          sinceCheckpoint = 0
        }
      }
      round += 1
    }
    (learned.result(), w)
  }

  /** The first `rounds` learned merges: one row per round —
    * (round, lhs, rhs, merged, pair_cnt). A flat driver-built table
    * (the rules were harvested during training), not a union of lazy
    * per-round plans. */
  def merges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, rounds)._1
      .map(m => (m.round.toLong, m.lhs, m.rhs, m.lhs + m.rhs, m.pairCnt))
      .toDF("round", "lhs", "rhs", "merged", "pair_cnt")
  }

  /** Apply the learned merges to the corpus: per doc, the token count
    * and the symbol count after all `rounds` merges — the compression
    * accounting that decides whether a merge budget is worth shipping.
    * One corpus scan joined against the final (token → symbol count)
    * table from training (vocab-sized; Catalyst broadcasts when
    * small); only (doc_id, counts) reach the rollup. Docs whose text
    * yields no tokens vanish on both sides (inner explode ≡ the
    * oracle's unnest). */
  def encode(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val encodedVocab = learn(docs, rounds)._2
      .select(col("token"), size(col("syms")).cast("long").as("token_syms"))
    graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(col("toks")).as("token"))
      .join(encodedVocab, Seq("token"))
      .groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        sum("token_syms").as("n_symbols"))
  }

  /** Per-source tokenizer fertility after the learned merges — the
    * "how well does this tokenizer fit each slice?" report a tokenizer
    * owner reads before shipping a merge budget: token, post-merge
    * symbol and character totals per source, plus two integer rates —
    * `syms_per_token_milli` (fertility: symbols the tokenizer spends
    * per whitespace word ×1000) and `compression_milli` (fraction of
    * raw characters surviving the merges ×1000). A slice whose
    * fertility stays near its character count got nothing out of the
    * merge table — the signal to retrain or re-balance.
    *
    * Scale shape: same as [[encode]] — training's one corpus-sized
    * word-count aggregate, then vocab-bounded rounds; application is
    * one exploded scan joined against the (token → symbol count)
    * vocab (broadcast when small) collapsing straight to |sources|
    * groups, with per-(source, token) partial aggregation map-side. */
  def fertility(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val encodedVocab = learn(docs, rounds)._2
      .select(col("token"), size(col("syms")).cast("long").as("token_syms"))
    graft.Tables.spread(docs.select(col("source"), col("text")))
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .join(encodedVocab, Seq("token"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum("token_syms").as("n_symbols"),
        sum(length(col("token"))).as("n_chars"))
      .select(col("source"), col("n_tokens"), col("n_symbols"), col("n_chars"),
        expr("(1000 * n_symbols) div n_tokens").as("syms_per_token_milli"),
        expr("(1000 * n_symbols) div n_chars").as("compression_milli"))
  }

  /** Replay learned merge rules, in training order, over a
    * (…, syms) table — each rule is a stateless [[mergeFold]]
    * projection with the pair inlined as literals, re-materialized
    * every [[CheckpointEvery]] rules exactly like training (same
    * `reliableCheckpoint` durability trade as [[learn]]), so plan
    * depth stays constant in the rule count here too. */
  private def applyMerges(table: DataFrame, rules: Seq[MergeRule],
                          reliableCheckpoint: Boolean): DataFrame = {
    var t = table
    var sinceCheckpoint = 0
    rules.foreach { r =>
      t = t.withColumn("syms", mergeFold(col("syms"), lit(r.lhs), lit(r.rhs)))
      sinceCheckpoint += 1
      if (sinceCheckpoint >= CheckpointEvery) {
        t = if (reliableCheckpoint) t.checkpoint(false)
            else t.localCheckpoint(false)
        sinceCheckpoint = 0
      }
    }
    t
  }

  /** Apply an ALREADY-LEARNED tokenizer to a corpus — the
    * train-once/apply-many half of the lifecycle, where [[encode]]
    * retrains internally: rules (and optionally the training run's
    * final word table, from [[learn]]._2) come from corpus A, the
    * docs are corpus B. Tokens of B found in A's vocabulary reuse the
    * stored symbol sequences outright; unseen tokens seed their
    * characters and replay the rules — which yields EXACTLY the
    * stored sequences for known tokens too (training applied the same
    * folds in the same order), so the vocab is purely a
    * skip-the-replay optimization and `vocab = None` is bit-identical
    * (BpeSpec pins the equivalence).
    *
    * Scale shape matches [[encode]]: the corpus-sized work is one
    * tokenize scan and the final (token → symbol count) join; the
    * replay runs over B's DISTINCT unseen tokens only —
    * vocabulary-bounded, constant plan depth via [[applyMerges]]. */
  def encodeWith(docs: DataFrame, rules: Seq[MergeRule],
                 vocab: Option[DataFrame] = None,
                 reliableCheckpoint: Boolean = false): DataFrame = {
    val bTokens = graft.Tables.spread(docs.select(col("text")))
      .select(explode(tokens(col("text"))).as("token")).distinct()
    val tokenSyms = vocab match {
      case Some(v) =>
        val known = bTokens.join(v.select("token", "syms"), Seq("token"))
        val unseen = applyMerges(
          bTokens.join(v.select("token"), Seq("token"), "left_anti")
            .select(col("token"), chars(col("token")).as("syms")),
          rules, reliableCheckpoint)
        known.unionByName(unseen)
      case None =>
        applyMerges(
          bTokens.select(col("token"), chars(col("token")).as("syms")),
          rules, reliableCheckpoint)
    }
    val encodedVocab = tokenSyms
      .select(col("token"), size(col("syms")).cast("long").as("token_syms"))
    graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(col("toks")).as("token"))
      .join(encodedVocab, Seq("token"))
      .groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        sum("token_syms").as("n_symbols"))
  }

  /** The cross-corpus lifecycle as one query: learn the merges on the
    * even-doc_id half of the corpus, apply them (reusing the trained
    * word table) to the odd half — proof that a learned tokenizer
    * transfers, with the transfer itself oracle-checked. */
  def encodeCross(docs: DataFrame, rounds: Int = 3,
                  reliableCheckpoint: Boolean = false): DataFrame = {
    val (rules, trained) =
      learn(docs.filter(pmod(col("doc_id"), lit(2)) === 0), rounds,
        reliableCheckpoint)
    encodeWith(docs.filter(pmod(col("doc_id"), lit(2)) === 1), rules,
      Some(trained), reliableCheckpoint)
  }

  /** Left-to-right non-overlapping merge of adjacent (lhs, rhs) as a
    * back-looking fold (see object doc for the equivalence argument).
    * `&&` short-circuits, so `element_at(acc, -1)` never runs on the
    * empty accumulator. */
  private[llm] def mergeFold(syms: Column, lhs: Column, rhs: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lhs && s === rhs,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(lhs, rhs))))
          .otherwise(concat(acc, array(s))))
}
