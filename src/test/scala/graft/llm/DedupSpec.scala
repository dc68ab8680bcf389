package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LLM dedup tier tests: exact, MinHash+LSH+Jaccard, SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "pack my box with five dozen liquor jugs before the night falls"),
    (2L, "completely different words about streaming engines and shuffles here"),
    (10L, "the quick brown fox jumps over the lazy dog again and again today"))

  test("exactDedup groups identical normalized text, keeps min doc_id") {
    val docs = (base :+ (20L, "THE  quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).sortBy(_._1)
    // 0,10,20 collapse (case+whitespace normalize); 1 and 2 singletons
    assert(got.toSeq == Seq((0L, 3L), (1L, 1L), (2L, 1L)))
  }

  test("minhashDedup finds the near-identical pair and only it") {
    val docs = (base.take(3) :+
      (10L, "dup the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashDedup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(got.toSeq == Seq((0L, 10L)))
  }

  test("minhash jaccard sizes are exact shingle-set set-ops") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.minhashDedup(docs).collect().head
    // identical docs: 3 shingles each, inter = union = 3
    assert(got.getAs[Long]("inter_size") == 3L)
    assert(got.getAs[Long]("union_size") == 3L)
  }

  test("simhash of identical docs is identical; hamming 0 pair found") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (9L, "totally unrelated content with other words entirely")).toDF("doc_id", "text")
    val pairs = Dedup.simhashDedup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 5L && p._3 == 0L))
  }

  test("simhashDedup survives a pathologically hot sketch (10k identical docs)") {
    // regression: the old collect_list design put all 10k doc_ids of a
    // shared sketch into ONE row; the join-expansion design streams the
    // 10k·9999/2 pairs out of an equi-join probe instead
    val n = 10000
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        lit("boilerplate header repeated across the whole corpus verbatim").as("text"))
    val got = Dedup.simhashDedup(docs)
    assert(got.count() == n.toLong * (n - 1) / 2)
    // spot-check shape: every pair is ordered and hamming 0
    val sample = got.limit(5).collect()
    sample.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("hamming") == 0L)
    }
  }

  test("MinHashAgg typed aggregator equals the expression-form signature") {
    val docs = base.take(3).toDF("doc_id", "text")
    val viaAgg = Dedup.minhashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaExpr = docs
      .select(col("doc_id"), TextFns.tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"),
        TextFns.shingleHashSetFromTokenHashes(col("ths"), Dedup.ShingleK).as("sh"))
      .select(col("doc_id"), posexplode(Dedup.signature(col("sh"))))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    assert(viaAgg == viaExpr && viaAgg.size == 3 * Dedup.NumHashes)
  }

  test("native sketch expressions equal their HOF column twins") {
    val docs = base.toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.tokenHashes(col("text")).as("ths"))
      .select(col("doc_id"), col("ths"),
        TextFns.shingleHashSetFromTokenHashes(col("ths"), 3).as("sh"))
    val rows = docs.select(
      Dedup.simhashFromTokenHashes(col("ths")).as("native_sim"),
      Dedup.simhashFromTokenHashesHof(col("ths")).as("hof_sim"),
      Dedup.signature(col("sh")).as("native_sig"),
      Dedup.signatureHof(col("sh")).as("hof_sig")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getAs[collection.Seq[Long]](2) == r.getAs[collection.Seq[Long]](3))
    }
    // empty-input conventions match too
    val empty = spark.sql("SELECT array()").select(
      Dedup.simhashFromTokenHashes(expr("cast(array() as array<bigint>)")).as("s"),
      Dedup.signature(expr("cast(array() as array<bigint>)")).as("g"),
      Dedup.simhashFromTokenHashesHof(expr("cast(array() as array<bigint>)")).as("sh"),
      Dedup.signatureHof(expr("cast(array() as array<bigint>)")).as("gh")).collect().head
    assert(empty.getLong(0) == empty.getLong(2))
    assert(empty.getAs[collection.Seq[Long]](1) == empty.getAs[collection.Seq[Long]](3))
  }

  test("docs with fewer than k tokens produce NO vacuous near-dup pairs") {
    // regression: empty shingle sets used to share the all-Prime
    // signature, collide in every band, and pass Jaccard at 0/0
    val docs = Seq(
      (0L, "one two"), (1L, "three four"), (2L, "hi"), (3L, ""),
      (4L, "a proper document with plenty of tokens for shingling here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashDedup(docs).collect().isEmpty)
    assert(Dedup.shingleSets(docs).collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("dedupClusters: star rounds find transitive components") {
    val pairs = Seq((2L, 5L), (5L, 9L), (20L, 21L)) // chain 2-5-9, pair 20-21
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters: a 64-node chain converges in O(log) rounds, not O(diameter)") {
    // path graph 0-1-2-…-63: min-label propagation needed 63 rounds
    // (one per hop of diameter); alternating large-star/small-star
    // collapses it exponentially
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.dedupClustersWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 64 && got.forall(_._2 == 0L))
    assert(rounds <= 8, s"expected ~log2(64) star rounds, took $rounds")
  }

  test("dedupClusters: unordered and duplicate pairs are canonicalized") {
    val pairs = Seq((5L, 2L), (2L, 5L), (9L, 5L), (7L, 7L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // self-loop 7-7 contributes node 7 labeling itself
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 7L -> 7L))
  }

  test("redact scrubs URLs, emails, and IPs in the right order") {
    val got = Seq(
      "see https://a.b/c?d=e and mail me bob.smith+x@corp.example.org from 192.168.1.7 ok",
      "no pii here").toDF("text")
      .select(TextAnalysis.redact(col("text")).as("r")).collect().map(_.getString(0))
    assert(got(0) == "see <URL> and mail me <EMAIL> from <IP> ok")
    assert(got(1) == "no pii here")
  }

  test("withNearDups injects doc_id+100000 prepend-mutated copies") {
    val docs = base.take(3).toDF("doc_id", "text")
    val corpus = Dedup.withNearDups(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(corpus.size == 4 && corpus(100000L).startsWith("dup the quick"))
  }

  test("dedupRateBySource attributes drops to the mirroring source") {
    val docs = Seq(
      (1L, "original content one", "sA"),
      (2L, "original content two", "sA"),
      (10L, "original content one", "sB"),  // sB mirrors doc 1 → dropped
      (11L, "unique to b", "sB"),
      (12L, "Original  Content one ", "sB") // normalization collapses → dup
    ).toDF("doc_id", "text", "source")
    val got = Dedup.dedupRateBySource(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("drop_pm"))).toMap
    // sA owns both originals (min ids); sB loses its two mirrors
    assert(got("sA") == ((2L, 0L, 0L)))
    assert(got("sB") == ((3L, 2L, 666L)))
  }

  test("crossSourceOverlap counts shared classes once per pair, copies don't inflate") {
    val docs = Seq(
      (1L, "shared one", "sA"),
      (2L, "shared one", "sA"),   // same class, same source: no self-pair
      (3L, "shared one", "sB"),
      (4L, "shared two", "sA"),
      (5L, "shared two", "sC"),
      (6L, "only in c", "sC")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_shared"))
      .toMap
    assert(got == Map(("sA", "sB") -> 1L, ("sA", "sC") -> 1L))
  }

  test("contamination: training docs sharing eval shingles are flagged with counts") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),            // eval
      (30L, "zz alpha beta gamma yy"),           // shares shingle "alpha beta gamma"
      (31L, "nothing in common here at all"),    // clean
      (32L, "alpha beta gamma delta")            // identical to eval doc
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(docs, evalMaxId = 20L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shingles: {a b g, b g d}; doc 30 shares exactly "alpha beta gamma";
    // doc 32 shares both; doc 31 is absent
    assert(got == Map(30L -> 1L, 32L -> 2L))
  }

  test("bloomContamination flags a superset of exact contamination") {
    // the Bloom pass may add false positives but can never miss a truly
    // shared shingle: every eval shingle's bits are in the filter
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (30L, "zz alpha beta gamma yy"),
      (31L, "nothing in common here at all"),
      (32L, "alpha beta gamma delta"),
      (33L, "unrelated tokens that share no trigram with eval data")
    ).toDF("doc_id", "text")
    val exact = Dedup.contamination(docs, evalMaxId = 20L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.bloomContamination(docs, evalMaxId = 20L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (doc, n) =>
      assert(bloom.contains(doc) && bloom(doc) >= n,
        s"doc $doc: bloom dropped or undercounted a real hit")
    }
    // with 2 eval shingles (6 bits max in 32768) the FP probability per
    // probed shingle is < (6/32768)^3 ≈ 6e-12 — flagging anything the
    // exact pass didn't would be a hash bug, not bad luck
    assert(bloom.keySet == exact.keySet)
    assert(bloom == Map(30L -> 1L, 32L -> 2L))
  }

  test("native bloomContaminatedFromTokenHashes ≡ HOF bloomContaminated") {
    val eval = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "shared trigram lives here too")).toDF("doc_id", "text")
    val filt = Dedup.bloomFilterArray(eval)
    // real corpus + crafted edges: a contaminated doc, a 2-token doc
    // (< ShingleK ⇒ no shingle ⇒ never flagged), empty and NULL text
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
      .unionAll(Seq(
        (9001L, "zz alpha beta gamma delta yy"),
        (9002L, "alpha beta"),
        (9003L, ""),
        (9004L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val native = docs.filter(
        Dedup.bloomContaminatedFromTokenHashes(TextFns.tokenHashes(col("text")), filt))
      .select("doc_id").as[Long].collect().toSet
    val hof = docs
      .withColumn("__ths", TextFns.tokenHashes(col("text")))
      .withColumn("__sh", TextFns.shingleHashSetFromTokenHashes(col("__ths"), Dedup.ShingleK))
      .filter(Dedup.bloomContaminated(col("__sh"), filt))
      .select("doc_id").as[Long].collect().toSet
    assert(native == hof)
    assert(native.contains(9001L))
    assert(!native.exists(Set(9002L, 9003L, 9004L)))
    // the kept side must agree as well (NULL text drops on BOTH forms:
    // a NULL predicate fails the filter whether negated or not)
    val keptNative = docs.filter(
        !Dedup.bloomContaminatedFromTokenHashes(TextFns.tokenHashes(col("text")), filt))
      .select("doc_id").as[Long].collect().toSet
    assert((keptNative ++ native) == docs.filter(col("text").isNotNull)
      .select("doc_id").as[Long].collect().toSet -- Set(9004L))
  }

  test("native windowHashes ≡ seeded-fold HOF twin, including sub-k and exactly-k docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
      .unionAll(Seq(
        (9101L, "only seven words live in this doc"),          // k-1: no window
        (9102L, "exactly eight tokens sit right here just so"), // one window
        (9103L, "")).toDF("doc_id", "text"))
    val k = Dedup.SpanK
    val staged = docs.select(col("doc_id"), TextFns.tokenHashes(col("text")).as("ths"))
    val native = staged.select(col("doc_id"),
      graft.functions.SketchExpressions.windowHashesCol(col("ths"), k, TextFns.Prime).as("wh"))
    val hof = staged.select(col("doc_id"),
      when(size(col("ths")) >= k,
        transform(sequence(lit(1), size(col("ths")) - (k - 1)),
          i => aggregate(slice(col("ths"), i + 1, lit(k - 1)), element_at(col("ths"), i),
            (acc, x) => pmod(acc * 31L + x, lit(TextFns.Prime)))))
        .otherwise(array()).as("wh"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (n, h) = (rows(native), rows(hof))
    assert(n == h)
    assert(n(9101L).isEmpty && n(9102L).length == 1 && n(9103L).isEmpty)
  }

  test("repeatedSpans: a shared footer is found exactly; an exact dup covers the whole doc") {
    val body1 = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val body2 = (1 to 20).map(i => s"beta$i").mkString(" ")
    val footer = (1 to 10).map(i => s"foot$i").mkString(" ")
    val twin = (1 to 15).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, body1 + " " + footer), // footer at tokens 21..30
      (2L, body2 + " " + footer),
      (3L, twin), (4L, twin),     // exact pair: whole doc repeated
      (5L, (1 to 12).map(i => s"delta$i").mkString(" ")), // unique
      (6L, "five short tokens only here")                 // sub-k
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // straddling windows are doc-unique, so the merged span is the
    // footer range exactly; the twin pair spans its full 15 tokens
    assert(spans == Set((1L, 21L, 30L), (2L, 21L, 30L),
      (3L, 1L, 15L), (4L, 1L, 15L)), s"got $spans")
    val frac = Dedup.repeatedTokenFraction(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(frac == Map(1L -> 333L, 2L -> 333L, 3L -> 1000L, 4L -> 1000L,
      5L -> 0L, 6L -> 0L), s"got $frac")
    // the excision transform: footer gone, body intact, dup pair empty
    val clean = Dedup.stripRepeatedSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(clean(1L) == (body1, 10L), s"got ${clean(1L)}")
    assert(clean(2L) == (body2, 10L))
    assert(clean(3L) == ("", 15L) && clean(4L) == ("", 15L))
    assert(clean(5L)._2 == 0L && clean(6L)._2 == 0L)
  }

  test("chunkDedup: injected whole-doc duplicates make every chunk boilerplate") {
    // 70-token docs => chunks of 32/32/6 tokens; doc 50 is duplicated
    val words = (0 until 70).map(i => s"w$i").mkString(" ")
    val other = (0 until 40).map(i => s"x$i").mkString(" ")
    val docs = Seq((50L, words), (51L, other), (100050L, words))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boilerplate"),
          r.getAs[Long]("kept_tokens")))).toMap
    assert(got(50L) == ((3L, 3L, 0L)))      // all three chunks shared
    assert(got(100050L) == ((3L, 3L, 0L)))
    assert(got(51L) == ((2L, 0L, 40L)))     // 32+8 tokens, all unique
  }

  test("chunkDedup survives a pathologically hot chunk (10k identical docs)") {
    // the cookie-banner case: one 32-token chunk shared by 10k docs.
    // The distinct+count side collapses it to ONE row; no doc-sized
    // rows or lists materialize anywhere.
    val words = (0 until 32).map(i => s"w$i").mkString(" ")
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      concat(lit(words), lit(" u"), col("id")).as("text"))
    val got = Dedup.chunkDedup(docs).collect()
      .map(r => (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boilerplate"),
        r.getAs[Long]("kept_tokens")))
    assert(got.length == 10000)
    // every doc: chunk 0 = the shared 32 tokens (boilerplate), chunk 1
    // = its unique "u<id>" token (kept)
    assert(got.forall(_ == ((2L, 1L, 1L))))
  }

  test("dedupRateCurve: counts are monotone in the threshold and exact on a known pair") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (10L, "a b c d e f g h i j"),          // jaccard 1000 vs 0
      (1L, "k l m n o p q r s t"),
      (11L, "zz k l m n o p q r s t"))       // high-but-<1000 vs 1
      .toDF("doc_id", "text")
    val got = Dedup.dedupRateCurve(docs).collect()
      .map(r => r.getAs[Long]("threshold_pm") -> r.getAs[Long]("n_docs_removed"))
      .toMap
    // doc 10 removable at every threshold; doc 11 at thresholds below
    // its jaccard (8 shared shingles of 10 total... jaccard well > 500)
    assert(got(900L) >= 1L && got(500L) >= got(900L))
    val counts = Seq(500L, 600L, 700L, 800L, 900L).map(t => got.getOrElse(t, 0L))
    assert(counts == counts.sorted.reverse, s"not monotone: $got")
  }

  test("corpusDelta classifies added/removed/changed/unchanged by id+digest") {
    val a = Seq(
      (1L, "kept as is"), (2L, "will change"), (3L, "will be removed"))
      .toDF("doc_id", "text")
    val b = Seq(
      (1L, "KEPT  as is"),        // digest-equal after normalization
      (2L, "changed content"),
      (4L, "brand new doc"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusDelta(a, b).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("chunkDedup: a shared chunk inside otherwise-unique docs is stripped") {
    val shared = (0 until 32).map(i => s"s$i").mkString(" ")
    val a = shared + " " + (0 until 32).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (0 until 32).map(i => s"b$i").mkString(" ")
    val got = Dedup.chunkDedup(Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boilerplate"),
          r.getAs[Long]("kept_tokens")))).toMap
    // chunk 0 (the shared 32 tokens) is boilerplate in both; chunk 1 kept
    assert(got == Map(1L -> ((2L, 1L, 32L)), 2L -> ((2L, 1L, 32L))))
  }

  test("leakageSafeSplit: cluster members share a split; singletons self-canonical") {
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("canonical_id"), r.getAs[String]("split")))).toMap
    assert(got.size == 10)
    // transitive cluster {0,1,2} -> canonical 0, one split for all
    assert(Seq(0L, 1L, 2L).map(got(_)._1).toSet == Set(0L))
    assert(Seq(0L, 1L, 2L).map(got(_)._2).toSet.size == 1)
    assert(got(5L)._1 == 5L && got(6L)._1 == 5L && got(5L)._2 == got(6L)._2)
    // singletons are their own canonical
    Seq(3L, 4L, 7L, 8L, 9L).foreach(i => assert(got(i)._1 == i))
    got.values.foreach(v => assert(Set("train", "val", "test")(v._2)))
  }

  test("leakageSafeSplit on driver corpus: no cluster straddles a split, rows = corpus") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val corpus = Dedup.withNearDups(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val split = Dedup.leakageSafeSplit(corpus, Dedup.minhashDedup(corpus))
    val rows = split.collect()
    assert(rows.length == corpus.count())
    // the leakage guarantee, audited: every canonical maps to exactly
    // one split value
    val byCanon = rows.groupBy(_.getAs[Long]("canonical_id"))
    byCanon.values.foreach(g =>
      assert(g.map(_.getAs[String]("split")).toSet.size == 1))
    // the 90/5/5 hash is roughly honored (loose bounds on a small corpus)
    val n = rows.length.toDouble
    val train = rows.count(_.getAs[String]("split") == "train") / n
    assert(train > 0.8 && train < 0.97, s"train share $train")
  }

  test("ngramDecontamination flags exactly the leak-injected training docs") {
    import spark.implicits._
    // ids: 7 and 107 are the eval split (≡7 mod 100); 16 is the
    // contamination-marked training doc (≡5 mod 11); 3 and 20 are clean
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (7L, "first eval document body with its own distinct tokens one two three"),
      (107L, "second eval document body entirely different words four five six"),
      (16L, "train doc that will be contaminated with the canary text"),
      (20L, "another clean training document with plenty of harmless tokens here")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramDecontamination(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dirty_windows"), r.getAs[Long]("n_eval_docs"))))
      .toMap
    // only the marked training doc is flagged — never the eval docs
    // themselves, never the clean docs
    assert(got.keySet === Set(16L))
    // the 17-token canary yields exactly 17-13+1 = 5 pure-leak windows;
    // boundary windows mix doc-specific tokens and match nothing
    assert(got(16L)._1 === 5L)
    // both eval docs carry the same canary windows
    assert(got(16L)._2 === 2L)
  }
}
