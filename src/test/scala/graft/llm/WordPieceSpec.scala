package graft.llm

import graft.SparkSpec

/** Greedy longest-match WordPiece encode: hand-computed chains, unk
  * accounting, and the BPE-vocab integration invariants. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(words: Seq[String], vocab: Seq[String]): Map[String, (Long, Long)] =
    WordPiece.encodeWords(words.toDF("token"), vocab.toDF("piece"))
      .collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("pieces"), r.getAs[Long]("unks"))).toMap

  test("greedy longest match: hand-computed piece chains") {
    val vocab = Seq("a", "b", "c", "ab", "abc")
    val got = enc(Seq("abcab", "aaa", "c"), vocab)
    // abcab: [abc][ab]; aaa: [a][a][a]; c: [c]
    assert(got("abcab") == ((2L, 0L)))
    assert(got("aaa") == ((3L, 0L)))
    assert(got("c") == ((1L, 0L)))
  }

  test("greedy is greedy, not optimal: longest prefix wins at each step") {
    // vocab {x, xy, yz}: "xyz" greedily takes [xy] then has only 'z'
    // (unseen) left — optimal [x][yz] would be 2 pieces 0 unk
    val got = enc(Seq("xyz"), Seq("x", "xy", "yz"))
    assert(got("xyz") == ((1L, 1L)))
  }

  test("characters outside the vocab advance one position and count as unk") {
    val got = enc(Seq("axb", "xxx"), Seq("a", "b"))
    assert(got("axb") == ((2L, 1L)))
    assert(got("xxx") == ((0L, 3L)))
  }

  test("encode over a BPE vocab: same-corpus training means zero unks") {
    val docs = Seq(
      (0L, "low lower lowest low low"),
      (1L, "new newer newest new"),
      (2L, "low new low")).toDF("doc_id", "text")
    val rows = WordPiece.encode(docs, rounds = 4).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unk") == 0L)
      val (nt, np) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_pieces"))
      // at least one piece per token, at most one per character
      assert(np >= nt)
    }
    // merges actually shorten something: total pieces < total chars
    val totalPieces = rows.map(_.getAs[Long]("n_pieces")).sum
    val totalChars = docs.select(
      org.apache.spark.sql.functions.expr(
        "sum(length(replace(text, ' ', '')))")).head().getLong(0)
    assert(totalPieces < totalChars,
      s"no merge ever applied: $totalPieces pieces vs $totalChars chars")
  }
}
