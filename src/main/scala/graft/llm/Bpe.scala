package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
  * rewrite is a stateless projection against the 1-row broadcast. At
  * 100 TB the rounds cost the same as at 100 GB. Application
  * ([[encode]]) is one corpus scan through `rounds` chained stateless
  * folds — no shuffle beyond the final per-doc rollup.
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

  /** The per-round best-pair tables (each one row: lhs, rhs, pair_cnt),
    * lazily chained — round r's pairs are counted over sequences
    * rewritten by rounds 1..r−1 — plus the FINAL word table
    * (token, cnt, syms) after all rewrites, so [[encode]] can reuse it
    * instead of re-aggregating the corpus and re-applying the merges. */
  private def learn(docs: DataFrame, rounds: Int): (Vector[DataFrame], DataFrame) = {
    require(rounds >= 1, "need at least one merge round")
    val words = docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .select(col("token"), col("cnt"), chars(col("token")).as("syms"))
    (1 to rounds).foldLeft((Vector.empty[DataFrame], words)) {
      case ((acc, w), _) =>
        val pairs = w
          .select(col("cnt"),
            explode_outer(when(size(col("syms")) >= 2,
              transform(sequence(lit(1), size(col("syms")) - 1),
                i => struct(element_at(col("syms"), i).as("l"),
                  element_at(col("syms"), i + 1).as("r"))))).as("p"))
          .filter(col("p").isNotNull)
          .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
          .agg(sum("cnt").as("pair_cnt"))
        val best = pairs
          .orderBy(col("pair_cnt").desc, col("lhs"), col("rhs")).limit(1)
        // LEFT join on true, not crossJoin: when a corpus exhausts its
        // learnable merges early, `best` is EMPTY and a cross join
        // would annihilate the word table (and, downstream, the whole
        // encode output). A null pair makes the fold an identity
        // rewrite instead.
        val rewritten = w.join(broadcast(best), lit(true), "left")
          .select(col("token"), col("cnt"),
            mergeFold(col("syms"), col("lhs"), col("rhs")).as("syms"))
        (acc :+ best, rewritten)
    }
  }

  /** The first `rounds` learned merges: one row per round —
    * (round, lhs, rhs, merged, pair_cnt). */
  def merges(docs: DataFrame, rounds: Int = 3): DataFrame =
    learn(docs, rounds)._1.zipWithIndex.map { case (best, i) =>
      best.select(lit(i + 1L).as("round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_cnt"))
    }.reduce(_ unionAll _)

  /** Apply the learned merges to the corpus: per doc, the token count
    * and the symbol count after all `rounds` merges — the compression
    * accounting that decides whether a merge budget is worth shipping.
    * One corpus scan through chained stateless folds (each round's
    * 1-row best broadcast); only (doc_id, counts) reach the rollup.
    * Docs whose text yields no tokens vanish on both sides (inner
    * explode ≡ the oracle's unnest). */
  def encode(docs: DataFrame, rounds: Int = 3): DataFrame = {
    // the folds ran once per DISTINCT token inside [[learn]]'s
    // word-count table (measured 4.6 s → vocab-bounded), and the
    // FINAL rewritten table comes back from learn directly — encode
    // adds no second corpus aggregate and no re-application; the
    // corpus scan just explodes and joins the (token → symbol count)
    // lookup, which Catalyst broadcasts when small
    val encodedVocab = learn(docs, rounds)._2
      .select(col("token"), size(col("syms")).cast("long").as("token_syms"))
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(col("toks")).as("token"))
      .join(encodedVocab, Seq("token"))
      .groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        sum("token_syms").as("n_symbols"))
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
