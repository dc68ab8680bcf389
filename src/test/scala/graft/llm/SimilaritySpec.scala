package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Similarity search: quantized cosine, brute top-k, LSH buckets. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("cosineQ: identical vectors score 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(1f, 1f, 0f), Seq(-1f, -1f, 0f))).toDF("a", "b")
    val got = df.select(Similarity.cosineQ(
      Similarity.quantize(col("a")), Similarity.quantize(col("b"))).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(math.abs(got(2) + 1.0) < 1e-9)
  }

  test("cosineTopK: nearest neighbor of a duplicate vector ranks first with score 1") {
    val df = emb(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(1f, 2f, 3f, 4f)),     // duplicate of query 0
      (2L, Seq(-4f, 3f, -2f, 1f)),
      (3L, Seq(0.5f, 1f, 1.5f, 2f))) // colinear with query 0
    val got = Similarity.cosineTopK(df, nQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"), r.getAs[Long]("rank")))
      .sortBy(_._3)
    assert(got.head._1 == 1L && math.abs(got.head._2 - 1.0) < 1e-6)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // colinear vector also ~1 (quantization permitting), ranks second
    assert(got(1)._1 == 3L && got(1)._2 > 0.999)
  }

  test("lshBucket is equal for identical vectors, and near-dup finds them") {
    val df = emb(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (10L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(-4f, 3f, -2f, 1f)))
    val buckets = df.select(col("vec_id"),
      Similarity.lshBucket(Similarity.quantize(col("embedding"))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(0L) == buckets(10L))
    val pairs = Similarity.embeddingNearDup(df).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("score")))
    assert(pairs.toSeq == Seq((0L, 10L, 1.0)))
  }

  test("multi-probe SRP near-dup: superset of single-probe, and catches 1-bit straddlers") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    // perturbed (not exact) copies: flip a few coordinates by ±1 so a
    // fraction of the pairs land in a bucket one sign bit away while
    // cosine stays ≥ 0.99 — the class single-bucket SRP cannot see
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val perturbed = base
      .select((col("vec_id") + 500000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(pmod(col("vec_id") + i, lit(16)) === 0,
            x + (when(pmod(col("vec_id") + i, lit(32)) === 0, 0.05f)
              .otherwise(-0.05f)))
            .otherwise(x)).as("embedding"))
    val corpus = base.unionAll(perturbed)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val single = pairSet(Similarity.embeddingNearDup(corpus))
    val multi = pairSet(Similarity.embeddingNearDupMp(corpus))
    assert(single.subsetOf(multi),
      "multi-probe must never lose a single-probe pair")
    // the perturbation keeps every (v, v') pair at cos ≥ 0.99, so the
    // TRUE pair set includes all of them; multi-probe must recover
    // strictly more of it than the single bucket (some straddle a bit)
    assert(multi.size > single.size,
      s"expected 1-bit straddlers: single=${single.size} multi=${multi.size}")
    // every recovered pair is genuinely ≥ 0.99 — scores carried through
    val minScore = Similarity.embeddingNearDupMp(corpus)
      .agg(min(col("score"))).collect().head.getDouble(0)
    assert(minScore >= 0.99)
  }

  test("native dot expression equals the HOF fold") {
    val df = Seq(
      (Seq(1L, -2L, 3L, 100L), Seq(7L, 5L, -1L, 2L)),
      (Seq(0L, 0L), Seq(0L, 9L))).toDF("a", "b")
    val rows = df.select(
      Similarity.dotQ(col("a"), col("b")).as("n"),
      Similarity.dotQHof(col("a"), col("b")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native dot and HOF twin both go NULL on mismatched lengths") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val r = df.select(
      Similarity.dotQ(col("a"), col("b")).as("n"),
      Similarity.dotQHof(col("a"), col("b")).as("h")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native dot and HOF twin both go NULL on a null element") {
    // containsNull=true schema: the native expression must emit the
    // element scan and match the HOF's null-poisoned fold
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
    val rows = df.select(
      Similarity.dotQ(col("a"), col("b")).as("n"),
      Similarity.dotQHof(col("a"), col("b")).as("h")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getLong(0) == 11L && rows(1).getLong(1) == 11L)
  }

  test("IVF recall vs brute force on real embeddings (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def resultSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = resultSet(Similarity.cosineTopK(emb, nQueries = 5, k = 10))
    val ivf = resultSet(Similarity.ivfTopK(emb, nCentroids = 16, nQueries = 5, k = 10))
    assert(brute.size == 50 && ivf.size == 50)
    val recall = (brute intersect ivf).size / 50.0
    // IVF probes one coarse cell: recall is bounded but must be real —
    // random 64-d embeddings give low cell purity, so a loose floor
    assert(recall >= 0.2, s"IVF recall collapsed: $recall")
    // multi-probe: recall is monotone in nprobe (probe set grows), and
    // probing ALL cells recovers brute force exactly
    val ivf3 = resultSet(Similarity.ivfTopK(emb, nCentroids = 16,
      nQueries = 5, k = 10, nprobe = 3))
    val recall3 = (brute intersect ivf3).size / 50.0
    assert(recall3 >= recall, s"nprobe=3 recall $recall3 below nprobe=1 $recall")
    val ivfAll = resultSet(Similarity.ivfTopK(emb, nCentroids = 16,
      nQueries = 5, k = 10, nprobe = 16))
    assert(ivfAll == brute, "nprobe=nCentroids must equal brute force")
  }

  test("PQ: a copy of a seed query reconstructs exactly and ranks first at cos 1") {
    // 20 synthetic 64-d vectors; vec 17 duplicates query vec 2. Vec 2 is
    // a codebook seed (vec_id < 16), so vec 17's nearest entry in every
    // subspace is vec 2's own slice at distance 0 — its reconstruction
    // IS vec 2, and the estimated cosine against query 2 is exactly 1.
    val rnd = new scala.util.Random(7)
    val base = (0L until 17L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val vecs = base :+ (17L, base(2)._2)
    val got = Similarity.pqTopK(emb(vecs: _*), nQueries = 5, k = 3)
      .filter(col("query_id") === 2L && col("rank") === 1L).collect().head
    assert(got.getAs[Long]("vec_id") == 17L)
    assert(got.getAs[Double]("score") == 1.0)
  }

  test("hashVectors: duplicate text ranks first at cosine 1 through the shared top-k") {
    val docs = Seq(
      (0L, "spark shuffles data across the cluster quickly"),
      (1L, "totally different words about windows and joins"),
      (2L, "filler content one"), (3L, "filler content two"),
      (4L, "filler content three"),
      (17L, "spark shuffles data across the cluster quickly") // dup of 0
    ).toDF("doc_id", "text")
    val vecs = TextAnalysis.hashVectors(docs)
    // identical text → identical count vector → cosine exactly 1
    val top = Similarity.cosineTopKQ(vecs, nQueries = 1, k = 3)
      .filter(col("rank") === 1L).collect().head
    assert(top.getAs[Long]("vec_id") == 17L)
    assert(top.getAs[Double]("score") == 1.0)
    // vector invariant: slot sums equal token counts
    val sums = vecs.select(col("vec_id"),
      aggregate(col("qv"), lit(0L), (a, x) => a + x).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(0L) == 7L && sums(17L) == 7L && sums(1L) == 7L)
  }

  test("PQ recall vs brute force on real embeddings (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pq = Similarity.pqTopK(embDf, nQueries = 5, k = 10)
    assert(pq.count() == 50)
    val recalls = Similarity.pqRecall(embDf, nQueries = 5, k = 10)
      .collect().map(r => r.getAs[Long]("recall_pm"))
    assert(recalls.length == 5)
    assert(recalls.forall(r => r >= 0 && r <= 1000))
    // 16 codes per 8-dim subspace is a coarse codebook, but on 500
    // random vectors the asymmetric estimate must keep real signal
    assert(recalls.sum / recalls.length >= 200,
      s"PQ mean recall collapsed: ${recalls.toSeq}")
  }

  test("k-means-refined IVF returns full result sets and real recall (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val km = Similarity.ivfTopK(emb, refineIters = 1).collect()
    assert(km.length == 50)
    val recall = Similarity.ivfRecall(emb, refineIters = 1).collect()
      .map(_.getAs[Long]("recall_pm"))
    // refined cells must still find real neighbors for every query
    assert(recall.length == 5 && recall.forall(_ > 0))
    // refinement actually moved the index: the result set differs from
    // the seed-centroid index for at least one query (random 64-d
    // embeddings make identical post-refinement cells implausible)
    val seedSet = Similarity.ivfTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kmSet = km.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kmSet != seedSet, "refinement changed nothing — suspicious")
    // a second Lloyd iteration composes cleanly: full result set, every
    // query still finds real neighbors
    val km2 = Similarity.ivfTopK(emb, refineIters = 2).collect()
    assert(km2.length == 50)
    val recall2 = Similarity.ivfRecall(emb, refineIters = 2).collect()
      .map(_.getAs[Long]("recall_pm"))
    assert(recall2.length == 5 && recall2.forall(r => r > 0 && r <= 1000))
  }

  test("IVF-PQ: probing all cells degrades exactly to the unrestricted PQ scan") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    // codes come from the GLOBAL codebook, so the cell structure only
    // restricts candidates — probing every cell removes the restriction
    val all = rows(Similarity.ivfPqTopK(embDf, nCentroids = 16, nprobe = 16))
    val pq = rows(Similarity.pqTopK(embDf))
    assert(all == pq, "nprobe=nCentroids IVF-PQ must equal plain PQ")
    // single-probe: full result set, real (if lossier) recall
    val one = Similarity.ivfPqTopK(embDf).collect()
    assert(one.length == 50)
    val recall = Similarity.ivfPqRecall(embDf).collect()
      .map(_.getAs[Long]("recall_pm"))
    assert(recall.length == 5 && recall.forall(r => r >= 0 && r <= 1000))
    // composed loss ≤ each half alone is not guaranteed pointwise, but
    // the index must keep some signal on at least one query
    assert(recall.max > 0, "IVF-PQ found no true neighbors at all")
  }

  test("k-means-refined PQ codebooks keep full results and do not lose recall (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val km = Similarity.pqTopK(embDf, refineIters = 1).collect()
    assert(km.length == 50)
    def meanRecall(iters: Int): Double = {
      val r = Similarity.pqRecall(embDf, refineIters = iters).collect()
        .map(_.getAs[Long]("recall_pm"))
      assert(r.length == 5 && r.forall(x => x >= 0 && x <= 1000))
      r.sum / 5.0
    }
    val seed = meanRecall(0)
    val refined = meanRecall(1)
    // Lloyd re-centering can only shrink mean quantization error, which
    // on these embeddings must not cost mean recall
    assert(refined >= seed,
      s"refined codebook mean recall $refined below seed $seed")
    // refinement actually moved the codebook: some query's result set
    // changed
    val seedSet = Similarity.pqTopK(embDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(km.map(r => (r.getLong(0), r.getLong(1))).toSet != seedSet,
      "refinement changed nothing — suspicious")
  }

  test("residual IVF-PQ: a copy of a seed reconstructs exactly and ranks first at cos 1") {
    // Same construction as the plain-PQ exactness test: vec 17 copies
    // query vec 2. Identical vectors land in the same cell, so vec
    // 17's RESIDUAL equals vec 2's — and vec 2 is a residual-codebook
    // seed, so vec 17 encodes at distance 0 in every subspace. Its
    // reconstruction cv + r̂ is exactly its own vector, making the
    // estimated cosine against query 2 exactly 1 — the recombination
    // identity (q·cv + Σ LUT over ‖cv‖²+2Σcv·r̂+Σ‖r̂‖²) holds
    // bit-for-bit, not just approximately.
    val rnd = new scala.util.Random(7)
    val base = (0L until 17L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val vecs = base :+ (17L, base(2)._2)
    val got = Similarity.ivfPqResTopK(emb(vecs: _*), nQueries = 5, k = 3)
      .filter(col("query_id") === 2L && col("rank") === 1L).collect().head
    assert(got.getAs[Long]("vec_id") == 17L)
    assert(got.getAs[Double]("score") == 1.0)
  }

  test("residual IVF-PQ on real embeddings: full result sets, bounded recall (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val res = Similarity.ivfPqResTopK(embDf).collect()
    assert(res.length == 50)
    val recalls = Similarity.ivfPqResRecall(embDf).collect()
      .map(_.getAs[Long]("recall_pm"))
    assert(recalls.length == 5 && recalls.forall(r => r >= 0 && r <= 1000))
    assert(recalls.max > 0, "residual IVF-PQ found no true neighbors at all")
  }

  test("residual multi-probe: recall never below single-probe, per query (sf0.001)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p1 = Similarity.ivfPqResRecall(embDf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("recall_pm")).toMap
    val p3 = Similarity.ivfPqResRecall(embDf, nprobe = 3).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("recall_pm")).toMap
    assert(p1.keySet == p3.keySet)
    p1.foreach { case (q, r1) =>
      assert(p3(q) >= r1, s"query $q: nprobe=3 recall ${p3(q)} < nprobe=1 $r1")
    }
  }

  test("ann_cell_stats: every vector counted once, shares sum to ~1000") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val embDf = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val stats = Similarity.cellStats(embDf).collect()
    val total = stats.map(_.getAs[Long]("n_vecs")).sum
    assert(total == embDf.count())
    // integer-floor shares: sum within nCells of 1000, never over
    val shareSum = stats.map(_.getAs[Long]("share_pm")).sum
    assert(shareSum <= 1000 && shareSum > 1000 - stats.length)
    // skew_pm = share_pm scaled by nCells: a perfectly balanced cell
    // reads 1000; all entries positive and consistent with counts
    stats.foreach { r =>
      val expect = 1000L * r.getAs[Long]("n_vecs") * 16 / total
      assert(r.getAs[Long]("skew_pm") == expect)
    }
  }

  test("quantize floors on exact float->double widening") {
    val got = spark.range(1).select(
      Similarity.quantize(array(lit(0.5f), lit(-0.5f), lit(0.0001f))).as("q"))
      .collect().head.getAs[collection.Seq[Long]]("q")
    assert(got == Seq(4096L, -4096L, 0L))
  }

  test("semanticDedup: exact copies are dropped, distinct directions kept") {
    val df = emb(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(-4f, 3f, -2f, 1f)),
      (2L, Seq(2f, -1f, 0f, 3f)),
      (10L, Seq(1f, 2f, 3f, 4f)),   // copy of 0
      (11L, Seq(-4f, 3f, -2f, 1f))) // copy of 1
    val got = Similarity.semanticDedup(df).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("is_dup"), Option(r.getAs[java.lang.Long]("dup_of")))).toMap
    assert(got.size == 5)
    assert(got(10L) == (1L, Some(0L)) && got(11L) == (1L, Some(1L)))
    Seq(0L, 1L, 2L).foreach(id => assert(got(id) == (0L, None)))
  }

  test("semanticDedup: greedy chain attributes every copy to the min id in the cell") {
    val v = Seq(1f, 2f, 3f, 4f)
    val df = emb((0L, v), (1L, v), (2L, v))
    val got = Similarity.semanticDedup(df).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("is_dup"), Option(r.getAs[java.lang.Long]("dup_of")))).toMap
    assert(got(0L) == (0L, None))
    assert(got(1L) == (1L, Some(0L)) && got(2L) == (1L, Some(0L)))
  }

  test("sourceCentroids: coherent source reads 1.0, split source reads cos(45°), micro-exact") {
    val docs = Seq(
      (0L, "same"), (1L, "same"), (10L, "mix"), (11L, "mix"))
      .toDF("doc_id", "source")
    val embs = emb(
      (0L, Seq(1f, 2f)), (1L, Seq(1f, 2f)),       // identical pair
      (10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)))     // orthogonal pair
    val got = Similarity.sourceCentroids(docs, embs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("mean_cos_micro"),
          r.getAs[Long]("min_cos_micro"))).toMap
    assert(got("same") == (2L, 1000000L, 1000000L))
    // centroid of (8192,0),(0,8192) floor-means to (4096,4096):
    // both members sit at cos 45° = 0.707107 in micro-units
    assert(got("mix") == (2L, 707107L, 707107L))
  }

  test("semanticDedup on driver corpus: every injected identical dup is caught") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val corpus = Similarity.withDupVectors(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val rows = Similarity.semanticDedup(corpus).collect()
    assert(rows.length == corpus.count())
    // identical pairs always share an argmax cell and cos = 1, so the
    // geometric path has 100% recall on exact copies — no probe dial
    val injected = rows.filter(_.getAs[Long]("vec_id") >= 100000L)
    assert(injected.nonEmpty)
    injected.foreach { r =>
      assert(r.getAs[Long]("is_dup") == 1L)
      assert(r.getAs[java.lang.Long]("dup_of") <= r.getAs[Long]("vec_id") - 100000L)
    }
    // stats roll up exactly: populations sum to the corpus, dup counts
    // to the per-vector verdicts, keep_pm is the integer-floor ratio
    val stats = Similarity.semanticDedupStats(corpus).collect()
    assert(stats.map(_.getAs[Long]("n_vecs")).sum == rows.length)
    assert(stats.map(_.getAs[Long]("n_dups")).sum ==
      rows.count(_.getAs[Long]("is_dup") == 1L))
    stats.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dups"))
      assert(r.getAs[Long]("keep_pm") == 1000L * (n - d) / n)
    }
  }

  test("hardNegatives: cross-label top-k with false-negative ceiling and positive anchor") {
    val df = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0L),
      (1L, Seq(1f, 0f, 0f, 0f), 0L),      // same-label duplicate -> anchor 1.0
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 1L),  // cos ~.9939 >= .95 -> denoised away
      (3L, Seq(0f, 1f, 0f, 0f), 1L),      // orthogonal
      (4L, Seq(1f, 1f, 0f, 0f), 1L))      // cos ~.7071
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, nQueries = 1, k = 2).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(4L, 3L),
      "the near-copy negative must be filtered as a false negative")
    assert(math.abs(got(0).getAs[Double]("score") - 0.707107) < 1e-6)
    assert(math.abs(got(1).getAs[Double]("score")) < 1e-6)
    got.foreach(r => assert(r.getAs[Double]("pos_score") == 1.0))
  }

  test("hardNegatives: anchor is NULL when the query label has no other member") {
    val df = Seq(
      (0L, Seq(1f, 0f), 7L),
      (1L, Seq(0.6f, 0.8f), 1L))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, nQueries = 1, k = 5).collect()
    assert(got.length == 1 && got.head.getAs[Long]("vec_id") == 1L)
    assert(got.head.isNullAt(got.head.fieldIndex("pos_score")))
  }

  test("hardNegatives on driver corpus: exact parity with the window-rank reference") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val vecs = emb.select(col("vec_id"), col("label"),
      Similarity.quantize(col("embedding")).as("qv"))
    val q = vecs.select(col("vec_id").as("query_id"), col("label").as("ql"),
      col("qv").as("qqv")).filter(col("query_id") < 4)
    val scored = vecs.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        Similarity.dotQ(col("qqv"), col("qv")).cast("double") /
          (sqrt(Similarity.norm2Q(col("qqv")).cast("double")) *
            sqrt(Similarity.norm2Q(col("qv")).cast("double"))))
    val pos = scored.filter(col("label") === col("ql"))
      .groupBy("query_id").agg(max("cos").as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val ref = scored.filter(col("label") =!= col("ql") && col("cos") < 0.95)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("vec_id"), round(col("cos"), 6).as("score"),
        col("rank").cast("long").as("rank"), round(col("pos"), 6).as("pos_score"))
      .collect().map(r => r.toSeq).toSet
    val got = Similarity.hardNegatives(emb, nQueries = 4, k = 5).collect()
      .map(r => r.toSeq).toSet
    assert(got == ref)
    assert(got.size == 4 * 5)
  }

  test("normStats: per-label discrete median and degenerate count") {
    // label 0 norms²(q=8192): 0, 4096², 8192² -> median 4096², one
    // zero vector below 500 permille of it; label 1: single vector
    val df = Seq(
      (1L, Seq(0f, 0f), 0),
      (2L, Seq(0.5f, 0f), 0),
      (3L, Seq(1f, 0f), 0),
      (4L, Seq(1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.normStats(df).collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("min_n2"),
          r.getAs[Long]("median_n2"), r.getAs[Long]("max_n2"),
          r.getAs[Long]("n_degenerate")))).toMap
    val q = 8192L
    assert(got(0L) == ((3L, 0L, 4096L * 4096L, q * q, 1L)))
    assert(got(1L) == ((1L, q * q, q * q, q * q, 0L)))
  }
}
