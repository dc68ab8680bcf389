package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram surprisal filter + temperature mixture weights. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigramSurprisal: hand-computed bits on a 2-doc corpus") {
    // unigrams: a=3, b=1, c=1, N=5
    // bits(a) = len(bin(5 div 3)) - 1 = 0; bits(b) = bits(c) = len(bin(5)) - 1 = 2
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = LangModel.unigramSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_bits"),
          r.getAs[Long]("millibits_per_token"))).toMap
    assert(got(0L) == (3L, 2L, 666L)) // (2*0 + 1*2) bits over 3 tokens
    assert(got(1L) == (2L, 2L, 1000L))
  }

  test("unigramSurprisal: the gate keeps low-rate docs and drops high-rate ones") {
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = LangModel.unigramSurprisal(docs, keepMaxMillibits = 700L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kept")).toMap
    assert(got(0L) == 1L && got(1L) == 0L)
  }

  test("unigramSurprisal: token-less docs drop; rates bounded by min/max token bits") {
    val docs = Seq((0L, "x y z"), (1L, "   "), (2L, "x x x x")).toDF("doc_id", "text")
    val rows = LangModel.unigramSurprisal(docs).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 2L))
    // every per-token cost is an integer number of bits, so the
    // milli-rate of any doc lies in [1000*min_bits, 1000*max_bits]
    rows.foreach { r =>
      val mb = r.getAs[Long]("millibits_per_token")
      assert(mb >= 0L && mb <= 64000L)
    }
  }

  test("bigramSurprisal: seen / backoff / OOV branches, hand-computed") {
    // train "a b a b c": unigrams a=2 b=2 c=1 (N=5);
    // bigrams (a,b)=2 (b,a)=1 (b,c)=1
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"), // (a,b): 2 div 2 -> 0 bits; (b,c): 2 div 1 -> 1 bit
      (3L, "c a"),   // (c,a) unseen, a seen: 3 + bits(5 div 2) = 4
      (5L, "a z"),   // z OOV: 3 + bits(5) = 5
      (7L, "a"))     // no bigram -> dropped
      .toDF("doc_id", "text")
    val got = LangModel.bigramSurprisal(train, score,
      keepMaxMillibits = 4000L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("total_bits"),
          r.getAs[Long]("n_backoff"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("millibits_per_bigram"),
          r.getAs[Long]("kept")))).toMap
    assert(got.keySet == Set(1L, 3L, 5L))
    assert(got(1L) == ((2L, 1L, 0L, 0L, 500L, 1L)))
    assert(got(3L) == ((1L, 4L, 1L, 0L, 4000L, 1L)))
    assert(got(5L) == ((1L, 5L, 0L, 1L, 5000L, 0L)))
  }

  test("bigramSurprisal: repeated bigram folds through tf, not re-joined") {
    // train "x y x y": bigrams (x,y)=2 (y,x)=1; unigrams x=2 y=2 N=4
    // score "x y x y x y": (x,y)*3 at bits(2 div 2)=0, (y,x)*2 at
    // bits(2 div 1)=1 -> total 2 bits over 5 bigrams
    val train = Seq((0L, "x y x y")).toDF("doc_id", "text")
    val score = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = LangModel.bigramSurprisal(train, score).collect().head
    assert(r.getAs[Long]("n_bigrams") == 5L)
    assert(r.getAs[Long]("total_bits") == 2L)
    assert(r.getAs[Long]("millibits_per_bigram") == 400L)
  }

  test("knSurprisal: all four branches, hand-computed exact rationals") {
    // train "a b a b c": uni a=2 b=2 c=1; bigrams (a,b)=2 (b,a)=1
    // (b,c)=1 -> T=3; n1a: a->1, b->2; n1b: a->1, b->1, c->1
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq(
      // seen (a,b): q = (4*2*3) div ((4*2-3)*3 + 3*1*1) = 24 div 18 = 1 -> 0 bits
      (1L, "a b"),
      // unseen (b,b), history b seen: q = 24 div (3*2*1) = 4 -> 2 bits
      (3L, "b b"),
      // w1 'z' unseen -> continuation-only: q = 3 div n1b(a)=1 -> 1 bit
      (5L, "z a"),
      // w1 'c' SEEN but never starts a bigram -> same continuation branch
      (7L, "c a"),
      // OOV continuation: q = 3 div 1 -> 1 bit, flagged in n_oov
      (9L, "z z"))
      .toDF("doc_id", "text")
    val got = LangModel.knSurprisal(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("total_bits"),
          r.getAs[Long]("n_backoff"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("millibits_per_bigram")))).toMap
    assert(got.keySet == Set(1L, 3L, 5L, 7L, 9L))
    assert(got(1L) == ((1L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((1L, 2L, 1L, 0L, 2000L)))
    assert(got(5L) == ((1L, 1L, 1L, 0L, 1000L)))
    assert(got(7L) == ((1L, 1L, 1L, 0L, 1000L)))
    assert(got(9L) == ((1L, 1L, 1L, 1L, 1000L)))
  }

  test("knSurprisal: KN reranks the 'Francisco' token below its raw frequency") {
    // 'f' occurs 3 times but ONLY after 's' (one continuation type);
    // 'x' occurs 3 times after 3 different contexts. After the novel
    // history 'q', KN must charge f MORE than x even though c1(f)=c1(x).
    val train = Seq((0L, "s f s f s f a x b x c x")).toDF("doc_id", "text")
    val score = Seq((1L, "q f"), (3L, "q x")).toDF("doc_id", "text")
    val got = LangModel.knSurprisal(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("total_bits")).toMap
    assert(got(1L) > got(3L),
      s"KN must penalize the collocation-bound token: $got")
  }

  test("knContinuation: counts and permille on a hand corpus") {
    val docs = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val got = LangModel.knContinuation(docs).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("c1"),
        r.getAs[Long]("n1b"), r.getAs[Long]("p_cont_pm")))
    // order: c1 desc, token asc; T=3 types, every token 1 left context
    assert(got.toSeq == Seq(("a", 2L, 1L, 333L), ("b", 2L, 1L, 333L),
      ("c", 1L, 1L, 333L)))
  }

  test("collocations: hand-computed Dice, minCount prunes, order deterministic") {
    // "a b" x3 (c1(a)=4: 'a b' x3 + 'a c'; c(b)=3) -> dice = 6000 div 7 = 857
    // "a c" x1 pruned by minCount=3; "b a" x2 pruned
    val docs = Seq(
      (0L, "a b a b"),   // bigrams: (a,b)x2, (b,a)x2... careful
      (1L, "a b"),
      (2L, "a c"))
      .toDF("doc_id", "text")
    // recount: doc0 "a b a b": (a,b),(b,a),(a,b); doc1: (a,b); doc2: (a,c)
    // c12(a,b)=3, c12(b,a)=1, c12(a,c)=1; c(a)=4? tokens: a,b,a,b,a,b,a,c
    // c(a)=4, c(b)=3, c(c)=1
    val got = LangModel.collocations(docs, minCount = 3L, k = 10).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Long]("dice_pm")))).toMap
    assert(got.keySet == Set(("a", "b")))
    assert(got(("a", "b")) == ((3L, 4L, 3L, 857L)))
  }

  test("mixtureWeights: sqrt temperature upweights the small source") {
    // 16 vs 4 tokens -> w = 4 vs 2; natural 800/200, sampled 666/333
    val docs = Seq(
      (0L, "big", ("t " * 16).trim),
      (1L, "small", ("t " * 4).trim)).toDF("doc_id", "source", "text")
    val got = LangModel.mixtureWeights(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("w"),
          r.getAs[Long]("natural_pm"), r.getAs[Long]("share_pm"),
          r.getAs[Long]("temp_ratio_pm"))).toMap
    assert(got("big") == (16L, 4L, 800L, 666L, 832L))
    assert(got("small") == (4L, 2L, 200L, 333L, 1665L))
    // temperature pulls shares toward uniform: big down, small up
    assert(got("big")._5 < 1000L && got("small")._5 > 1000L)
  }

  test("tokenDrift: identical snapshots read 0, disjoint read ~2,000,000") {
    val a = Seq((0L, "x y z")).toDF("doc_id", "text")
    val b = Seq((1L, "x y z")).toDF("doc_id", "text")
    val same = LangModel.tokenDrift(a, b).collect().head
    assert(same.getAs[Long]("l1_drift_micro") == 0L)
    assert(same.getAs[Long]("vocab_union") == 3L)
    val c = Seq((2L, "p q r")).toDF("doc_id", "text")
    val disj = LangModel.tokenDrift(a, c).collect().head
    // 6 tokens at floor(1e6/3) = 333333 each: the documented <=1 micro
    // per-token floor loss shows up exactly here
    assert(disj.getAs[Long]("l1_drift_micro") == 1999998L)
    assert(disj.getAs[Long]("vocab_union") == 6L)
  }

  test("tokenDrift: hand-computed partial shift") {
    // A: a a b (a=2/3, b=1/3); B: a b b b (a=1/4, b=3/4)
    // micro: a 666666 vs 250000 -> 416666; b 333333 vs 750000 -> 416667
    val a = Seq((0L, "a a b")).toDF("doc_id", "text")
    val b = Seq((1L, "a b b b")).toDF("doc_id", "text")
    val r = LangModel.tokenDrift(a, b).collect().head
    assert(r.getAs[Long]("n_tokens_a") == 3L && r.getAs[Long]("n_tokens_b") == 4L)
    assert(r.getAs[Long]("l1_drift_micro") == 833333L)
  }

  test("sourceDivergence: identical sources distance 0; disjoint pairs vanish") {
    // A and B share the exact unigram distribution -> l1_micro = 0;
    // C shares no token with either -> no (A,C)/(B,C) row (inner join
    // on shared tokens; disjoint real text sources don't exist)
    val docs = Seq(
      (0L, "A", "x x y"), (1L, "B", "x y x"),
      (2L, "C", "q q z")).toDF("doc_id", "source", "text")
    val rows = LangModel.sourceDivergence(docs).collect()
    assert(rows.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b"))).toSet == Set(("A", "B")))
    val ab = rows.head
    assert(ab.getAs[Long]("l1_micro") == 0L)
    assert(ab.getAs[Long]("shared_vocab") == 2L)
    assert(ab.getAs[Long]("vocab_a") == 2L && ab.getAs[Long]("vocab_b") == 2L)
  }

  test("sourceDivergence: hand-computed partial overlap") {
    // A: x=2/3 (666666), y=1/3 (333333); B: x=1/4 (250000), z=3/4 (750000)
    // shared = {x}: overlap = min(666666, 250000) = 250000
    // S_A = 999999, S_B = 1000000 -> l1 = 999999 + 1000000 - 500000 = 1499999
    val docs = Seq(
      (0L, "A", "x x y"), (1L, "B", "x z z z")).toDF("doc_id", "source", "text")
    val r = LangModel.sourceDivergence(docs).collect().head
    assert(r.getAs[Long]("overlap_micro") == 250000L)
    assert(r.getAs[Long]("l1_micro") == 1499999L)
    assert(r.getAs[Long]("shared_vocab") == 1L)
  }

  test("sourceDivergence on driver corpus: matches the tokenDrift full-outer form per pair") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = LangModel.sourceDivergence(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("l1_micro")).toMap
    assert(got.nonEmpty)
    // independent reference: tokenDrift's full-outer vocab-union L1 on
    // each pair's single-source slices must agree with the shared-token
    // identity exactly
    got.keys.foreach { case (sa, sb) =>
      val ref = LangModel.tokenDrift(
        docs.filter(col("source") === sa),
        docs.filter(col("source") === sb)).collect().head
      assert(ref.getAs[Long]("l1_drift_micro") == got((sa, sb)),
        s"pair ($sa,$sb)")
    }
    // distances live in [0, 2e6]
    got.values.foreach(v => assert(v >= 0L && v <= 2000000L))
  }

  test("mixtureWeights on driver corpus: shares sum to ~1000, ratios bracket 1000") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = LangModel.mixtureWeights(docs).collect()
    assert(rows.nonEmpty)
    val sharePm = rows.map(_.getAs[Long]("share_pm")).sum
    assert(sharePm <= 1000L && sharePm > 1000L - rows.length)
    val naturalPm = rows.map(_.getAs[Long]("natural_pm")).sum
    assert(naturalPm <= 1000L && naturalPm > 1000L - rows.length)
  }
}
