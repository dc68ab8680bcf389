package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the string-metric member of the
  * dedup family: pairs of documents whose fixed-length title prefix is
  * within Levenshtein distance `d`, found WITHOUT the all-pairs cross
  * join (the classic q-gram filtered similarity join: Gravano et al.
  * 2001, "Approximate String Joins in a Database (Almost) for Free").
  *
  * Complements the set-similarity operators ([[Dedup.minhashDedup]],
  * [[Dedup.ngramJaccardPairs]]): Jaccard over token shingles is blind
  * to single-character typos inside tokens (a one-char edit replaces
  * every shingle that covers it), while edit distance is exactly the
  * typo metric — the near-dup signal for titles, URLs, product names
  * and other short keys.
  *
  * Candidate generation is EXACT (never misses a true pair): an edit
  * touches at most `q` of a string's positional q-grams and shifts
  * surviving positions by at most `d`, so `ed(a,b) ≤ d` implies at
  * least `|Q(a)| − d·q` of a's positional q-grams match some q-gram of
  * b at a position offset ≤ `d` (and symmetrically for b). The
  * pipeline: equi-join on the q-gram string with the ±d positional
  * guard → per-pair distinct-position counts → count filter → exact
  * `levenshtein` verify on the surviving pairs only.
  *
  * Scale shape: the wide join carries slim (doc_id, len, pos, gram)
  * rows — q+ε bytes of gram, never the document. Hot q-grams are the
  * skew risk at corpus scale; the exact mitigation (not applied here,
  * where the positional guard already bounds fan-out) is stop-gram
  * exclusion with a per-string threshold rebate: drop the top-k
  * frequent grams from the join and lower each string's required
  * match count by the number of its positions holding a dropped gram —
  * the pigeonhole argument survives because an excluded position can
  * only lose a match it was guaranteed. The verify joins key on
  * doc_id against the titles projection (co-partitioned with the
  * candidate output), and the quadratic `levenshtein` runs on
  * filter-survivors only.
  */
object EditDistance {

  /** Pairs of docs whose `titleLen`-char prefix is within edit
    * distance `d`, with the exact distance. Titles shorter than
    * `minLen` are out of scope (the count filter needs
    * `len − q + 1 > d·q` to have teeth; below that, share-nothing
    * pairs become possible and only a cross join is exact). */
  def editDistancePairs(docs: DataFrame, d: Int = 2,
                        titleLen: Int = 32, minLen: Int = 8): DataFrame = {
    val q = 2
    require(minLen - q + 1 > d * q,
      s"minLen=$minLen too small for exact q-gram filtering at d=$d")
    val titles = docs
      .select(col("doc_id"), expr(s"substring(text, 1, $titleLen)").as("title"))
      .filter(length(col("title")) >= minLen)
    val qg = titles
      .select(col("doc_id"), length(col("title")).as("len"),
        explode(expr("transform(sequence(1, length(title) - 1)," +
          " i -> struct(i AS pos, substring(title, i, 2) AS gram))")).as("pq"))
      .select(col("doc_id"), col("len"),
        col("pq.pos").as("pos"), col("pq.gram").as("gram"))
    val cand = qg.toDF("doc_id_a", "len_a", "pos_a", "gram")
      .join(qg.toDF("doc_id_b", "len_b", "pos_b", "gram"), Seq("gram"))
      .filter(col("doc_id_a") < col("doc_id_b") &&
        abs(col("pos_a") - col("pos_b")) <= d &&
        abs(col("len_a") - col("len_b")) <= d)
      .groupBy("doc_id_a", "doc_id_b", "len_a", "len_b")
      .agg(countDistinct("pos_a").as("ma"), countDistinct("pos_b").as("mb"))
      .filter(col("ma") >= col("len_a") - (q - 1) - d * q &&
        col("mb") >= col("len_b") - (q - 1) - d * q)
    cand
      .join(titles.toDF("doc_id_a", "title_a"), "doc_id_a")
      .join(titles.toDF("doc_id_b", "title_b"), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"),
        levenshtein(col("title_a"), col("title_b")).cast("long").as("dist"))
      .filter(col("dist") <= d)
  }

  /** Corpus with injected typo near-dups: every doc_id ≡ 0 (mod 10)
    * re-inserted under +400000 with ONE substituted character (at a
    * doc_id-dependent position), every doc_id ≡ 5 (mod 10) under
    * +600000 with TWO — exercising dist 1 and the d=2 boundary, on
    * top of the corpus's natural shared-prefix pairs at dist 0. */
  def withTypoDocs(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text")
      .unionAll(docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 400000L).as("doc_id"),
          expr("concat(substring(text, 1, 2 + doc_id % 7), 'q'," +
            " substring(text, 4 + doc_id % 7, length(text)))").as("text")))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(10)) === 5)
        .select((col("doc_id") + 600000L).as("doc_id"),
          expr("concat(substring(text, 1, 2), 'q', substring(text, 4, 9)," +
            " 'z', substring(text, 14, length(text)))").as("text")))
}
