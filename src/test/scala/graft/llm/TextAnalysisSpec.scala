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

  test("docProfile fuses langId + qualityScore exactly (one scan, same values)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "el la que"), (3L, "xyz qqq"),
      (4L, "the the fox")).toDF("doc_id", "text")
    val fused = TextAnalysis.docProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val lang = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qual = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("quality")).toMap
    assert(fused.keySet == lang.keySet)
    fused.foreach { case (id, (l, q)) =>
      assert(l == lang(id) && q == qual(id), s"doc $id")
    }
  }

  test("vocabDf: tf sums occurrences, df counts docs, minDf filters") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "b d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabDf(docs, minDf = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: tf=3 (2+1), df=2; b: tf=2, df=2; c,d: df=1 filtered out
    assert(got == Map("a" -> (3L, 2L), "b" -> (2L, 2L)))
  }

  test("hashSample is deterministic and stable under corpus growth") {
    val small = spark.range(0, 1000).toDF("doc_id")
    val big = spark.range(0, 2000).toDF("doc_id")
    val keptSmall = TextAnalysis.hashSample(small, 100).collect()
      .map(_.getLong(0)).toSet
    val keptBig = TextAnalysis.hashSample(big, 100).collect()
      .map(_.getLong(0)).toSet
    // the doubled corpus keeps EXACTLY the old sample plus new-id picks —
    // hash sampling never churns previously-kept rows
    assert(keptBig.filter(_ < 1000) == keptSmall)
    // ~10% +- wide tolerance (multiplicative hash, not perfectly uniform)
    assert(keptSmall.size > 50 && keptSmall.size < 200, s"got ${keptSmall.size}")
  }

  test("stratifiedSample downsamples the configured language only") {
    val docs = (0L until 100L).map { i =>
      if (i % 2 == 0) (i, "the cat and the dog is here")
      else (i, "el la que de los")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.stratifiedSample(docs, Map("en" -> 0), 1000)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(got.nonEmpty)
    assert(got.forall(_._2 == "es"), "en rows must be sampled out at rate 0")
    assert(got.map(_._1).forall(_ % 2 == 1))
  }

  test("chunkDocs: overlap windows, short-doc whole chunk, empty doc none") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than chunk
      (3L, "   ")                                     // no tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, chunkSize = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val doc1 = got.filter(_._1 == 1L).sortBy(_._2)
    // stride 2: starts 1,3,5,7 → last chunk index = (10-4+1) div 2 = 3
    assert(doc1.map(_._3).toList == List(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(doc1.forall(_._4 == 4L))
    assert(got.filter(_._1 == 2L).toList == List((2L, 0L, "a b", 2L)))
    assert(!got.exists(_._1 == 3L))
  }

  test("tokenQuantiles: exact discrete quantiles, ties and skew included") {
    // lengths: 1x1, 3x2, 4x3, 2x10 → N=10; cum: 1,4,8,10
    // p25 -> ceil(2.5)=first cum>=2.5 -> 2; p50 -> cum>=5 -> 3; p75 -> cum>=7.5 -> 3
    val docs = (
      Seq("a") ++ Seq.fill(3)("a b") ++ Seq.fill(4)("a b c") ++
        Seq.fill(2)(Seq.fill(10)("w").mkString(" "))
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.tokenQuantiles(docs).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(250 -> 2L, 500 -> 3L, 750 -> 3L))
  }

  test("docRepetition: boilerplate scores high, varied text scores zero") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"), // hot bigram "buy now"/"now buy"
      (2L, "the quick brown fox jumps"),       // all bigrams distinct
      (3L, "solo")                             // no bigrams → absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docRepetition(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("total_bigrams"), r.getAs[Long]("distinct_bigrams"),
          r.getAs[Long]("max_bigram_count"), r.getAs[Long]("repetition_pm"))).toMap
    // doc 1: 7 bigrams, 2 distinct ("buy now"x4, "now buy"x3)
    assert(got(1L) == ((7L, 2L, 4L, 1000L * 5 / 7)))
    assert(got(2L) == ((4L, 4L, 1L, 0L)))
    assert(!got.contains(3L))
  }

  test("bigramCommonness: corpus-shared bigrams count, singletons don't") {
    val docs = Seq(
      (1L, "the quick fox"),   // "the quick" shared with doc 2, "quick fox" singleton
      (2L, "the quick dog"),   // "the quick" shared, "quick dog" singleton
      (3L, "zz qq zz qq"),     // self-repeated: "zz qq"x2 is ONE doc's — df=1
      (4L, "solo")             // no bigrams → absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCommonness(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("total_bigrams"), r.getAs[Long]("common_bigrams"),
          r.getAs[Long]("commonness_pm"))).toMap
    assert(got(1L) == ((2L, 1L, 500L)))
    assert(got(2L) == ((2L, 1L, 500L)))
    // df counts DOCUMENTS, not occurrences: doc 3's hot bigrams have df=1
    assert(got(3L) == ((3L, 0L, 0L)))
    assert(!got.contains(4L))
  }

  test("sourceMix: per-source docs, tokens, mean quality, english count") {
    val docs = Seq(
      (1L, "the quick fox and the dog", "en?", "sA"),
      (2L, "el que la los de", "es?", "sA"),
      (3L, "x", "und?", "sB")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.sourceMix(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_en"))).toMap
    assert(got("sA") == ((2L, 11L, 1L)))
    assert(got("sB") == ((1L, 1L, 0L)))
    // mean is the integer div of the quality sum
    val prof = TextAnalysis.docProfile(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("quality")).toMap
    val mixA = TextAnalysis.sourceMix(docs).filter($"source" === "sA")
      .collect().head.getAs[Long]("avg_quality_pm")
    assert(mixA == (prof(1L) + prof(2L)) / 2)
  }

  test("weightedSample keeps exactly the docs whose bucket beats quality") {
    val docs = (0L until 300L).map { i =>
      // quality varies with length; empty docs have quality ~0
      (i, Seq.fill((i % 30).toInt)("w" + i % 7).mkString(" "))
    }.toDF("doc_id", "text")
    val prof = TextAnalysis.docProfile(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("quality")).toMap
    val kept = TextAnalysis.weightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("quality"), r.getAs[Long]("bucket")))
    assert(kept.nonEmpty && kept.length < 300)
    kept.foreach { case (_, q, b) => assert(b < q) }
    // exact membership: every excluded doc fails the gate
    val keptIds = kept.map(_._1).toSet
    val bucketOf = TextAnalysis.hashSample(docs, 1000).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    (0L until 300L).foreach { i =>
      assert(keptIds.contains(i) == (bucketOf(i) < prof(i)))
    }
  }

  test("encodeDocs: frequency-ranked ids, OOV is 0, positions ordered") {
    // tf: aa=4, bb=3, cc=1, zz=1 -> vocab(2): aa=1, bb=2; cc/zz OOV
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "bb aa zz bb aa")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.encodeDocs(docs, vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("pos")) -> r.getAs[Long]("token_id"))
      .toMap
    assert(got == Map(
      (1L, 0L) -> 1L, (1L, 1L) -> 2L, (1L, 2L) -> 1L, (1L, 3L) -> 0L,
      (2L, 0L) -> 2L, (2L, 1L) -> 1L, (2L, 2L) -> 0L, (2L, 3L) -> 2L,
      (2L, 4L) -> 1L))
  }

  test("examplesPerSource: k smallest buckets per source, rerun-stable") {
    val docs = (0L until 100L).map(i => (i, s"d$i", s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.examplesPerSource(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        (r.getLong(1), r.getAs[Long]("bucket"))).toMap
    assert(got.size == 8) // 4 sources x 2 ranks
    // each source's picks are its true 2 smallest buckets, ties by id
    val buckets = TextAnalysis.hashSample(docs, 1000).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    (0 until 4).foreach { s =>
      val want = (0L until 100L).filter(_ % 4 == s)
        .map(i => (buckets(i), i)).sorted.take(2)
      val gotS = (1L to 2L).map(r => got((s"s$s", r)))
        .map { case (id, b) => (b, id) }
      assert(gotS == want, s"source s$s")
    }
  }

  test("oovRate: head-vocab tokens are covered, tail tokens count as OOV") {
    // vocabSize=2 → vocab is the two most frequent tokens: "aa" (5), "bb" (3)
    val docs = Seq(
      (1L, "aa aa bb zz"),   // 1 of 4 OOV
      (2L, "aa bb bb"),      // all covered
      (3L, "qq ww ee aa aa") // 3 of 5 OOV
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("oov"),
          r.getAs[Long]("oov_pm"))).toMap
    assert(got(1L) == ((4L, 1L, 250L)))
    assert(got(2L) == ((3L, 0L, 0L)))
    assert(got(3L) == ((5L, 3L, 600L)))
  }

  test("docKeywords: repeated rare terms outrank common ones, k bounds rows") {
    val docs = Seq(
      (1L, "zebra zebra zebra the the a of and is"),
      (2L, "the a of and is common words here"),
      (3L, "the a of and is common words there")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docKeywords(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank")) ->
        (r.getString(1), r.getAs[Long]("tfidf_pm"))).toMap
    // doc 1: zebra tf=3 df=1 -> 3000, far above any shared term
    assert(got((1L, 1L)) == (("zebra", 3000L)))
    // every doc emits at most 3 rows, ranks are 1..k
    val byDoc = got.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc.values.forall(rs => rs == (1L to rs.size).toSet && rs.size <= 3))
    // doc 2: "here" (df=1) tops; the df=2 pair ties at 500 and breaks
    // on token text — "common" before "words"
    val doc2 = (1L to 3L).map(r => got((2L, r)))
    assert(doc2 == Seq(("here", 1000L), ("common", 500L), ("words", 500L)))
  }

  test("tokenQuantilesApprox: rank-window verdicts hold and reject bad ranks") {
    val docs = (0L until 400L).map { i =>
      (i, Seq.fill((i % 20 + 1).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.tokenQuantilesApprox(docs).collect()
      .map(r => r.getAs[Long]("q_pm") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("rank_ok"))).toMap
    assert(got.keySet == Set(250L, 500L, 750L))
    got.values.foreach { case (n, ok) => assert(n == 400L && ok == 1L) }
    // the window has teeth: with a zero tolerance, a value whose true
    // rank is off by even one row on this 20-step ladder still passes
    // only if it is a legal discrete quantile — the uniform ladder
    // makes every requested q land exactly on a step, so tol=0 holds
    val tight = TextAnalysis.tokenQuantilesApprox(docs, tolPm = 0L)
      .collect().map(_.getAs[Long]("rank_ok"))
    assert(tight.forall(_ == 1L))
  }

  test("topQualityPerLang: k best per language, quality desc then doc_id asc") {
    val docs = Seq(
      // en docs with increasing word counts → increasing length_pm/quality
      (1L, "the a"), (2L, "the cat and a dog is great here now ok"),
      (3L, "the fox and a hen is quick brown lazy fine"),
      // es
      (10L, "el la"), (11L, "el la que de los uno dos tres cuatro cinco")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topQualityPerLang(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val prof = TextAnalysis.docProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // expected: per lang, order by (quality desc, doc_id asc), take 2
    val expect = prof.toSeq
      .groupBy(_._2._1)
      .flatMap { case (lang, rows) =>
        rows.map { case (id, (_, q)) => (lang, id, q) }
          .sortBy { case (_, id, q) => (-q, id) }.take(2).zipWithIndex
          .map { case ((l, id, q), i) => (l, id, q, i + 1L) }
      }.toSet
    assert(got.toSet == expect)
    assert(got.count(_._1 == "en") == 2 && got.count(_._1 == "es") == 2)
  }

  test("ngramNovelty: first-seen attribution by doc_id, permille exact, short docs drop") {
    val docs = Seq(
      (0L, "a b c"),   // {ab, bc} both introduced here -> 1000
      (1L, "a b d"),   // {ab, bd}: ab seen in doc 0 -> 500
      (2L, "a b c"),   // all seen -> 0
      (3L, "x"))       // single token: no bigrams, drops
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_pm"))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L) == (2L, 2L, 1000L))
    assert(got(1L) == (2L, 1L, 500L))
    assert(got(2L) == (2L, 0L, 0L))
  }

  test("ngramNovelty: repeated bigrams inside one doc count once (distinct grams)") {
    val docs = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    // bigrams: ab, ba, ab, ba, ab -> distinct {ab, ba}
    val got = TextAnalysis.ngramNovelty(docs).collect().head
    assert(got.getAs[Long]("n_ngrams") == 2L)
    assert(got.getAs[Long]("novelty_pm") == 1000L)
  }

  test("gopherRules: each rule trips on its crafted violation only") {
    // a healthy 50-word document that passes everything
    val good = (Seq("the", "have", "with") ++
      (1 to 47).map(i => s"word$i")).mkString(" ")
    // violations, one rule each (others held healthy where possible)
    val short = "the be have"                           // r_wordcount
    val longWords = (Seq("the", "of", "and") ++ (1 to 47)
      .map(i => s"extraordinarily$i")).mkString(" ")    // r_meanlen (>10 avg)
    val hashy = (Seq("the", "of") ++ (1 to 48)
      .map(i => s"w$i#")).mkString(" ")                 // r_symbol (48#/50w)
    val bullets = (Seq("the have with a b c d e f g") ++
      (1 to 10).map(i => s"- item$i")).mkString("\n")   // r_bullet (10/11)
    val numbers = (Seq("the", "of", "and") ++ (1 to 47)
      .map(i => s"$i$i")).mkString(" ")                 // r_alpha (3/50 alpha)
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ") // r_required
    val docs = Seq(
      (0L, good), (1L, short), (2L, longWords), (3L, hashy),
      (4L, bullets), (5L, numbers), (6L, noStop)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("r_wordcount"), r.getAs[Long]("r_meanlen"),
          r.getAs[Long]("r_symbol"), r.getAs[Long]("r_bullet"),
          r.getAs[Long]("r_alpha"), r.getAs[Long]("r_required"),
          r.getAs[Long]("gopher_keep"))).toMap
    assert(got(0L) == (1L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(got(1L)._1 == 0L && got(1L)._7 == 0L)
    assert(got(2L)._2 == 0L && got(2L)._7 == 0L)
    assert(got(3L)._3 == 0L && got(3L)._7 == 0L)
    assert(got(4L)._4 == 0L && got(4L)._7 == 0L)
    assert(got(5L)._5 == 0L && got(5L)._7 == 0L)
    assert(got(6L)._6 == 0L && got(6L)._7 == 0L)
  }
}
