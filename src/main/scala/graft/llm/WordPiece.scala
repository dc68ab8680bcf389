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
  * One deliberate simplification vs BERT: no `##` continuation
  * namespace — one flat piece vocabulary (documented, pinned by the
  * oracle; the `##` split would double the vocab table, nothing
  * else).
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

  /** The flat piece vocabulary learned by [[Bpe]]: corpus characters
    * ∪ merge outputs. Relational end-to-end (the rules are the same
    * ≤1-row-per-round collects Bpe already does). */
  private[llm] def vocab(trainDocs: DataFrame, rounds: Int): DataFrame = {
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
    chars.union(merged).distinct()
  }

  /** Greedy longest-match encode of every distinct word against a
    * piece vocabulary: one row per word with its piece count and
    * unmatched-character count. */
  private[llm] def encodeWords(words: DataFrame, pieces: DataFrame): DataFrame = {
    // every (position, length) substring of every distinct word...
    val cands = words
      .select(col("token"), explode(sequence(lit(0), length(col("token")) - 1)).as("p"))
      .select(col("token"), col("p"),
        explode(sequence(lit(1), length(col("token")) - col("p"))).as("l"))
      .select(col("token"), col("p"),
        expr("substring(token, p + 1, l)").as("piece"), col("l"))
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
}
