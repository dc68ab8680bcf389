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

  // ---- the BERT `##` continuation namespace -------------------------

  private def encBert(words: Seq[String],
                      nsVocab: Seq[(String, Int)]): Map[String, (Long, Long)] =
    WordPiece.encodeWordsBert(words.toDF("token"),
        nsVocab.toDF("piece", "ns"))
      .collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("pieces"), r.getAs[Long]("unk_words"))).toMap

  test("namespaced longest match: continuation pieces only match past position 0") {
    // "under" with initial {un, u} and continuation {der, d, e, r, n}:
    // [un][##der] — "der" may not start a word, "un" may not continue
    val ns = Seq("un" -> 0, "u" -> 0, "der" -> 1, "d" -> 1,
      "e" -> 1, "r" -> 1, "n" -> 1)
    assert(encBert(Seq("under"), ns)("under") == ((2L, 0L)))
    // "ab" where "ab" is attested ONLY as a continuation: position 0
    // must fall back to [a], then [##b] — 2 pieces where the flat
    // vocab {a, b, ab} would take [ab] as 1
    val ns2 = Seq("ab" -> 1, "a" -> 0, "b" -> 1)
    assert(encBert(Seq("ab"), ns2)("ab") == ((2L, 0L)))
    assert(enc(Seq("ab"), Seq("a", "b", "ab"))("ab") == ((1L, 0L)))
  }

  test("whole-word [UNK]: any unmatched position voids the word (BERT is_bad)") {
    // "xn": [x] matches, but 'n' has no continuation piece — the WHOLE
    // word becomes one [UNK] (pieces = 1, unk_words = 1), unlike the
    // flat walk's per-character unk advancement
    val got = encBert(Seq("xn", "x"), Seq("x" -> 0))
    assert(got("xn") == ((1L, 1L)))
    assert(got("x") == ((1L, 0L)))
    // unmatched at position 0 (no initial piece at all) also voids
    assert(encBert(Seq("nx"), Seq("x" -> 0))("nx") == ((1L, 1L)))
  }

  test("namespacedVocab attests pieces from training-word positions") {
    val got = WordPiece.namespacedVocab(
        Seq("abc", "bc").toDF("token"),
        Seq("a", "b", "c", "bc").toDF("piece"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // a: prefix of abc only; b: mid-abc AND prefix of bc; c: mid-word
    // only; bc: mid-abc AND prefix of bc
    assert(got == Set("a" -> 0, "b" -> 0, "b" -> 1, "c" -> 1,
      "bc" -> 0, "bc" -> 1))
  }

  test("on train == apply the namespace is inert: encodeBert coincides with flat encode") {
    // the attestation theorem (WordPiece scaladoc): every substring
    // the flat walk matches at position p of training word w is
    // attested at p's class by w itself, so the walks coincide and
    // unks are zero on both sides
    val docs = Seq(
      (0L, "low lower lowest low low"),
      (1L, "new newer newest new"),
      (2L, "low new low")).toDF("doc_id", "text")
    val flat = WordPiece.encode(docs, rounds = 4)
      .select("doc_id", "n_tokens", "n_pieces").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val bert = WordPiece.encodeBert(docs, docs, rounds = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_pieces"),
          r.getAs[Long]("n_unk_words")))).toMap
    assert(flat.keySet == bert.keySet)
    flat.foreach { case (id, (nt, np)) =>
      assert(bert(id) == ((nt, np, 0L)),
        s"doc $id: flat ($nt, $np) vs bert ${bert(id)}")
    }
  }

  test("cross split: held-out text pays the namespace (fertility diff is real)") {
    // train corpus never shows "ab" word-initially ("zab" only), the
    // apply corpus leads with it — the flat vocab happily matches
    // [ab] at position 0, the namespaced walk must take [a][##b]
    val train = Seq((0L, "zab zab a b za")).toDF("doc_id", "text")
    val apply = Seq((1L, "ab za")).toDF("doc_id", "text")
    val d = WordPiece.fertilityDiff(train, apply, rounds = 1).head()
    // round 1 merges the most frequent pair; with "zab zab a b za"
    // the pairs are za(3), ab(2) -> "za" wins; vocab = {z,a,b,za}.
    // flat: "ab" -> [a][b] = 2, "za" -> [za] = 1 => 3 pieces, 0 unks
    // bert: initial attested {z,za,zab? no-"zab" not in vocab, a, b},
    //   continuation {a, b, ab? not in vocab}: "ab" -> [a][##b] = 2,
    //   "za" -> [za] = 1 => 3 pieces... (same here; the interesting
    //   binding needs a MERGED piece mis-attested, checked below)
    assert(d.getAs[Long]("n_tokens") == 2L)
    assert(d.getAs[Long]("flat_unks") == 0L)
    assert(d.getAs[Long]("n_unk_words") == 0L)
    // now a genuinely binding case: train "xza xza" makes merge "xz"
    // or "za"... keep it direct instead — vocab from train attests
    // "za" ONLY mid-word ("xza"), apply leads a word with it
    val train2 = Seq((0L, "xza xza x z a")).toDF("doc_id", "text")
    val apply2 = Seq((1L, "zax")).toDF("doc_id", "text")
    val d2 = WordPiece.fertilityDiff(train2, apply2, rounds = 1).head()
    // round-1 pairs in {xza:2, x:1, z:1, a:1}: xz(2) beats za(2)
    // lexicographically? counts equal -> (cnt desc, lhs, rhs): "xz" <
    // "za" so best = (x,z); vocab = {x,z,a,xz}
    // flat "zax": [z][a][x] = 3 pieces 0 unk
    // bert: initial attested = {x, xz, xza?(not in vocab)}; z and a
    //   are NOT attested word-initially in train (every train word is
    //   xza, x, z, a — wait, words "z" and "a" ARE train words, so z/a
    //   attest initially after all; "zax" -> [z][##a][##x]? x attested
    //   mid-word? "xza" has x at 0 only; word "x" at 0 only -> x has
    //   NO continuation attestation -> position 2 fails -> whole-word
    //   UNK: pieces 1, unk_words 1
    assert(d2.getAs[Long]("n_unk_words") == 1L)
    assert(d2.getAs[Long]("bert_pieces") == 1L)
    assert(d2.getAs[Long]("flat_pieces") == 3L)
    assert(d2.getAs[Long]("flat_unks") == 0L)
  }
}
