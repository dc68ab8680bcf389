package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style greedy longest-match encoding (Wu et al. 2016,
  * "Google's Neural Machine Translation System", §3.1; the
  * BERT-tokenizer apply algorithm) over the SAME learned vocabulary
  * as the BPE path: vocab = every single character of the training
  * corpus plus each merge's output string ([[Bpe]] rounds 1..R). The
  * two encoders therefore answer the same vocab-budget question with
  * the two industrial algorithms — BPE replays merge HISTORY in
  * order, WordPiece ignores history and greedily takes the longest
  * vocab piece at each position — and `wordpiece_encode_8` vs
  * `bpe_encode_8` diff directly (same corpus, same 8-round vocab).
  * Two variants: [[encode]] keeps ONE flat piece vocabulary (the
  * round-12 simplification, kept with its oracle), and [[encodeBert]]
  * implements BERT's real `##` continuation namespace (word-initial
  * vs continuation pieces, whole-word [UNK]) with [[fertilityDiff]]
  * quantifying what the namespace discipline costs in pieces.
  *
  * Greedy-per-word is inherently sequential, which is exactly why it
  * is worth showing relationally: the engine computes, for every
  * DISTINCT word and every start position, the longest vocab piece
  * starting there — an (explode positions × lengths) → vocab
  * equi-join → max aggregate, all data-parallel — and only the final
  * chain-follow runs as a per-word `aggregate` fold over a
  * `length(word)`-step sequence with O(1) map lookups (each step
  * advances ≥ 1, so `length` steps always suffice; a character with
  * no vocab match — impossible when train ⊇ apply, possible under a
  * split — advances 1 and counts in `n_unk`). Per-word work is
  * O(len²) candidate substrings, on the DISTINCT vocabulary only;
  * occurrences join the encoded vocabulary afterward — the same
  * distinct-then-join shape as [[Bpe.fertility]], so a 100 TB corpus
  * pays the quadratic only on its (bounded) word list, never per
  * occurrence. The DuckDB oracle follows the identical chain with a
  * recursive CTE — same math, the sequential spelling.
  */
object WordPiece {

  /** The flat piece vocabulary learned by [[Bpe]] (corpus characters
    * ∪ merge outputs) plus the distinct TRAINING word list — the two
    * ingredients every encode variant needs, from ONE training run.
    * Relational end-to-end (the rules are the same ≤1-row-per-round
    * collects Bpe already does). */
  private[llm] def vocabAndWords(trainDocs: DataFrame,
                                 rounds: Int): (DataFrame, DataFrame) = {
    val spark = trainDocs.sparkSession
    import spark.implicits._
    val (rules, wordTable) = Bpe.learn(trainDocs, rounds)
    // characters come from the LEARNED word table (vocab-sized,
    // already checkpointed by learn) — not from a second tokenize
    // pass over the corpus
    val chars = wordTable
      .select(explode(split(col("token"), "")).as("piece"))
      .filter(length(col("piece")) > 0)
      .distinct()
    val merged = rules.map(r => r.lhs + r.rhs).toDF("piece").distinct()
    (chars.union(merged).distinct(), wordTable.select("token").distinct())
  }

  private[llm] def vocab(trainDocs: DataFrame, rounds: Int): DataFrame =
    vocabAndWords(trainDocs, rounds)._1

  /** Every (position, length) substring of every distinct word:
    * (token, p, l, piece) — the shared candidate table under both the
    * flat and the namespaced longest-match. */
  private def substrings(words: DataFrame): DataFrame =
    words
      .select(col("token"), explode(sequence(lit(0), length(col("token")) - 1)).as("p"))
      .select(col("token"), col("p"),
        explode(sequence(lit(1), length(col("token")) - col("p"))).as("l"))
      .select(col("token"), col("p"),
        expr("substring(token, p + 1, l)").as("piece"), col("l"))

  /** Greedy longest-match encode of every distinct word against a
    * piece vocabulary: one row per word with its piece count and
    * unmatched-character count. */
  private[llm] def encodeWords(words: DataFrame, pieces: DataFrame): DataFrame = {
    // every (position, length) substring of every distinct word...
    val cands = substrings(words)
    // ...kept iff in vocab; longest match per position
    val longest = cands.join(pieces, "piece")
      .groupBy("token", "p").agg(max("l").as("adv"))
    // per-word step map, then the greedy chain as a length-bounded fold
    val steps = longest.groupBy("token")
      .agg(map_from_entries(collect_list(struct(col("p"), col("adv"))))
        .as("steps"))
    words.join(steps, Seq("token"), "left")
      .select(col("token"), expr(
        """aggregate(
          |  sequence(1, length(token)),
          |  named_struct('pos', 0, 'pieces', 0L, 'unks', 0L),
          |  (acc, i) -> CASE WHEN acc.pos >= length(token) THEN acc
          |    ELSE named_struct(
          |      'pos', acc.pos + coalesce(element_at(steps, acc.pos), 1),
          |      'pieces', acc.pieces +
          |        IF(element_at(steps, acc.pos) IS NULL, 0L, 1L),
          |      'unks', acc.unks +
          |        IF(element_at(steps, acc.pos) IS NULL, 1L, 0L)) END)
          |""".stripMargin).as("acc"))
      .select(col("token"), col("acc.pieces").as("pieces"),
        col("acc.unks").as("unks"))
  }

  /** Per-document WordPiece encode stats over the [[Bpe]]-learned
    * vocabulary: whitespace token count, total greedy piece count and
    * unmatched-character count (0 when the vocab was trained on the
    * same corpus — every character is a piece). Token-less docs drop,
    * matching [[Bpe.encode]]. */
  def encode(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val occ = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val words = occ.select("token").distinct()
    occ.join(encodeWords(words, vocab(docs, rounds)), "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("pieces")).as("n_pieces"),
        sum(col("tf") * col("unks")).as("n_unk"))
  }

  // ---- the BERT `##` continuation namespace --------------------------
  //
  // Real WordPiece (the BERT tokenizer, Wu et al. §3.1) keeps TWO piece
  // namespaces: word-initial pieces and `##`-prefixed continuation
  // pieces, and a position's longest match may only use the namespace
  // its position belongs to. The flat variant above deliberately
  // collapses them (documented + oracle-pinned); this half closes the
  // gap. The namespaces DERIVE from the training corpus the same way
  // BERT's vocab builder attests them: a piece is available
  // word-initially iff it occurs as a PREFIX of some training word,
  // and as a continuation iff it occurs at a non-zero position of some
  // training word. UNK follows BERT's whole-word rule (`is_bad`): a
  // word with ANY unmatched position encodes as a single [UNK] piece,
  // not per-character unks.

  /** (piece, ns) rows of the namespaced vocabulary: ns = 0 for
    * word-initial availability, 1 for `##`-continuation. Derived by
    * joining the flat vocab against the training words' substring
    * attestations — the same distinct-word O(len²) candidate table the
    * encoder itself uses, so the derivation adds one slim join, never
    * a corpus pass. */
  private[llm] def namespacedVocab(trainWords: DataFrame,
                                   flat: DataFrame): DataFrame =
    substrings(trainWords).join(flat, "piece")
      .select(col("piece"),
        when(col("p") === 0, 0).otherwise(1).as("ns"))
      .distinct()

  /** Greedy longest-match under the namespaces: position 0 may only
    * match word-initial pieces, positions > 0 only continuations; any
    * unmatched position turns the WHOLE word into one [UNK]
    * (pieces = 1, unk_words = 1) — BERT's `is_bad` contract. */
  private[llm] def encodeWordsBert(words: DataFrame,
                                   nsVocab: DataFrame): DataFrame = {
    val cands = substrings(words)
      .withColumn("ns", when(col("p") === 0, 0).otherwise(1))
    val longest = cands.join(nsVocab, Seq("piece", "ns"))
      .groupBy("token", "p").agg(max("l").as("adv"))
    val steps = longest.groupBy("token")
      .agg(map_from_entries(collect_list(struct(col("p"), col("adv"))))
        .as("steps"))
    // same length-bounded fold as the flat path, with a sticky `bad`
    // flag instead of per-character unk advancement
    words.join(steps, Seq("token"), "left")
      .select(col("token"), expr(
        """aggregate(
          |  sequence(1, length(token)),
          |  named_struct('pos', 0, 'pieces', 0L, 'bad', false),
          |  (acc, i) -> CASE
          |    WHEN acc.bad OR acc.pos >= length(token) THEN acc
          |    WHEN element_at(steps, acc.pos) IS NULL THEN
          |      named_struct('pos', acc.pos, 'pieces', acc.pieces,
          |                   'bad', true)
          |    ELSE named_struct(
          |      'pos', acc.pos + element_at(steps, acc.pos),
          |      'pieces', acc.pieces + 1L, 'bad', false) END)
          |""".stripMargin).as("acc"))
      .select(col("token"),
        when(col("acc.bad"), 1L).otherwise(col("acc.pieces")).as("pieces"),
        when(col("acc.bad"), 1L).otherwise(lit(0L)).as("unk_words"))
  }

  private def occurrences(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
    .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  /** Per-document BERT-namespaced WordPiece encode of `applyDocs`
    * under a vocabulary (and its namespaces) learned on `trainDocs`:
    * token count, piece count (an [UNK] word contributes exactly 1),
    * and whole-word UNK count.
    *
    * The namespace only BINDS on held-out text — on train == apply it
    * is provably inert: any substring the flat walk matches at
    * position p of word w is attested at p's own position class BY w
    * ITSELF (w is a training word), so the namespaced longest match
    * equals the flat one at every position and the two walks coincide
    * (WordPieceSpec pins the coincidence). The registry query is
    * therefore CROSS-corpus (train even doc_ids, apply odd, the
    * [[Bpe.encodeCross]] split): there an apply word's substring may
    * be unattested at its class — a merge output seen only mid-word
    * cannot match word-initially and vice versa — which is exactly
    * the discipline BERT's `##` namespace imposes, and
    * [[fertilityDiff]] prices. */
  def encodeBert(trainDocs: DataFrame, applyDocs: DataFrame,
                 rounds: Int): DataFrame = {
    val (flat, trainWords) = vocabAndWords(trainDocs, rounds)
    val occ = occurrences(applyDocs)
    val words = occ.select("token").distinct()
    occ.join(encodeWordsBert(words, namespacedVocab(trainWords, flat)), "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("pieces")).as("n_pieces"),
        sum(col("tf") * col("unk_words")).as("n_unk_words"))
  }

  /** Corpus-level comparison of the two WordPiece variants on the
    * same held-out split and ONE shared training run (vocab learned
    * once, feeds both encoders): total tokens, pieces and unks under
    * the flat vocab (per-character unk advancement) vs the
    * `##`-namespaced one (whole-word [UNK]), per-variant fertility
    * (pieces per 1000 tokens), and the namespace overhead in permille
    * — the price BERT's positional discipline pays in sequence
    * length, UNK-policy effect included (the honest comparison of the
    * two deployable tokenizers). The final combine is a 1-row × 1-row
    * join (both sides global aggregates — the plan-audit's
    * bounded-BNLJ shape). */
  def fertilityDiff(trainDocs: DataFrame, applyDocs: DataFrame,
                    rounds: Int): DataFrame = {
    val (flat, trainWords) = vocabAndWords(trainDocs, rounds)
    val occ = occurrences(applyDocs)
    val words = occ.select("token").distinct()
    val flatTotals = occ.join(encodeWords(words, flat), "token")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("pieces")).as("flat_pieces"),
        sum(col("tf") * col("unks")).as("flat_unks"))
    val bertTotals = occ
      .join(encodeWordsBert(words, namespacedVocab(trainWords, flat)), "token")
      .agg(sum(col("tf") * col("pieces")).as("bert_pieces"),
        sum(col("tf") * col("unk_words")).as("n_unk_words"))
    flatTotals.join(bertTotals)
      .select(col("n_tokens"), col("flat_pieces"), col("flat_unks"),
        col("bert_pieces"), col("n_unk_words"),
        expr("(1000 * flat_pieces) div n_tokens").as("flat_fertility_milli"),
        expr("(1000 * bert_pieces) div n_tokens").as("bert_fertility_milli"),
        expr("(1000 * bert_pieces) div flat_pieces").as("overhead_pm"))
  }
}
