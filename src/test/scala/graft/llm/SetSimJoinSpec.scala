package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact prefix-filtered set-similarity join: completeness vs brute
  * force (the theorem's empirical twin), hand-computed Jaccard values,
  * and the selectivity report's internal consistency. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Pseudo-random-ish but deterministic corpus with real overlap
    * structure: shared vocab + shifted windows so pair similarities
    * spread across (0, 1). */
  private def corpus(n: Int): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (0 until n).map { i =>
      val toks = (0 until 10).map(j => vocab((i * 3 + j * 7) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
  }

  /** Brute-force shingle-set Jaccard pairs ≥ pm, computed driver-side
    * from the engine's OWN shingle sets (so the subject under test is
    * candidate generation + verification, not the shingling). */
  private def brute(docs: org.apache.spark.sql.DataFrame, pm: Int): Set[(Long, Long, Long, Long)] = {
    val sets = Dedup.shingleSets(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Seq[Long]]("sh").toSet))
    (for {
      (ida, sa) <- sets; (idb, sb) <- sets if ida < idb
      inter = (sa intersect sb).size.toLong
      union = (sa union sb).size.toLong
      if inter * 1000L >= union * pm
    } yield (ida, idb, inter, union)).toSet
  }

  private def engine(docs: org.apache.spark.sql.DataFrame, pm: Int): Set[(Long, Long, Long, Long)] =
    SetSimJoin.ssjoinExact(docs, pm).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter_size"), r.getAs[Long]("union_size"))).toSet

  test("matches brute force exactly across thresholds (completeness + precision)") {
    val docs = corpus(30).toDF("doc_id", "text")
    for (pm <- Seq(300, 500, 700, 900)) {
      val b = brute(docs, pm)
      val e = engine(docs, pm)
      assert(e == b, s"pm=$pm: engine ${e.size} pairs vs brute ${b.size}")
      assert(b.nonEmpty || pm == 900, s"pm=$pm degenerate fixture")
    }
  }

  test("hand-computed pair: one differing trailing token") {
    // shingles(6 toks) = 4; docs share 3 of 5 distinct shingles
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g")).toDF("doc_id", "text")
    val rows = SetSimJoin.ssjoinExact(docs, 500).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("inter_size") == 3L)
    assert(r.getAs[Long]("union_size") == 5L)
    assert(r.getAs[Long]("jaccard_pm") == 600L)
  }

  test("finds pairs below the LSH banding knee") {
    // J = 600 pm < the (4,4) S-curve knee (~700 pm): the exactness
    // contract this operator exists for
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g")).toDF("doc_id", "text")
    assert(SetSimJoin.ssjoinExact(docs, 600).count() == 1L)
  }

  test("prefix stats: internally consistent and matching the join") {
    val docs = corpus(30).toDF("doc_id", "text")
    val m = SetSimJoin.ssjoinPrefixStats(docs, 500).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    assert(m.keySet == Set("n_docs", "n_prefix_postings", "n_candidate_pairs", "n_pairs"))
    assert(m("n_docs") == 30L)
    // prefixes are strict subsets of the postings at this threshold
    val totalPostings = Dedup.shingleSets(docs)
      .select(explode(col("sh"))).count()
    assert(m("n_prefix_postings") < totalPostings)
    assert(m("n_pairs") <= m("n_candidate_pairs"))
    assert(m("n_pairs") == engine(docs, 500).size.toLong)
  }

  test("dedupRecallAudit: groups tie out; LSH is a subset of exact") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val corpus = Dedup.withNearDups(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val nExact = SetSimJoin.ssjoinExact(corpus).count()
    val nLsh = Dedup.minhashDedup(corpus)
      .select("doc_a", "doc_b").distinct().count()
    val rows = SetSimJoin.dedupRecallAudit(corpus).collect()
      .map(r => r.getAs[Int]("in_lsh") -> r.getAs[Long]("n_pairs")).toMap
    assert(rows.keySet.subsetOf(Set(0, 1)))
    // partition of the exact pair set; the LSH group is the LSH count
    assert(rows.values.sum === nExact)
    assert(rows.getOrElse(1, 0L) === nLsh)
  }

  test("prefix length formula: exact integer ceil, never empty") {
    // sz = 7, t = 0.5 -> ceil = 4, prefix = 4; sz = 1 -> prefix = 1
    val docs = Seq(
      (1L, "a b c d e f g h i"), // 7 shingles
      (2L, "a b c")).toDF("doc_id", "text") // 1 shingle
    val pref = SetSimJoin.prefixPostings(SetSimJoin.sizedSets(docs), 500)
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    assert(pref(1L) == 4L)
    assert(pref(2L) == 1L)
  }
}
