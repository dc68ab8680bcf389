package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token counting, language ID, quality permilles, fingerprint, n-grams. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: whitespace vs BPE-ish token counts") {
    val docs = Seq((1L, "hello world42 it's x!")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenStats(docs).collect().head
    assert(got.getAs[Long]("n_ws_tokens") == 4L)
    // hello | world | 42 | it | ' | s | x | !
    assert(got.getAs[Long]("n_bpe_tokens") == 8L)
    assert(got.getAs[Long]("n_chars") == 21L)
  }

  test("langId: marker argmax with en-priority tiebreak, und when empty") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "el la que"), (3L, "der und das"),
      (4L, "le et les"), (5L, "xyz qqq"), (6L, "the la")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "und", 6L -> "en"))
  }

  test("qualityScore permilles are exact integer arithmetic") {
    val docs = Seq((1L, "the the fox")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(docs).collect().head
    assert(got.getAs[Long]("word_count") == 3L)
    assert(got.getAs[Long]("length_pm") == 60L)     // 3*20
    assert(got.getAs[Long]("unique_pm") == 666L)    // 2000 div 3
    assert(got.getAs[Long]("stop_pm") == 666L)      // 2 stopwords of 3
    assert(got.getAs[Long]("quality") == (60L + 666L + 666L) / 3L)
  }

  test("fingerprint equals the hand-computed polynomial hash") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val docs = Seq((1L, "Ab c"), (2L, "ab  C")).toDF("doc_id", "text")
    val got = TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ref("ab c"))
    assert(got(2L) == ref("ab c")) // normalization collapses case+whitespace
  }

  test("ngramCounts: exact bigram counts; single-token docs contribute none") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b" -> 3L, "b a" -> 1L))
  }
}
