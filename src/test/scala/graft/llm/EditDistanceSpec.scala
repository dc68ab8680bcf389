package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q-gram filtered Levenshtein similarity join: hand cases + the
  * losslessness differential vs the brute-force cross join. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs: substitution, insertion, deletion within d=2") {
    val docs = Seq(
      (1L, "abcdefghij"),
      (2L, "abcdeXghij"),   // 1 substitution vs 1
      (3L, "abcdefghijk"),  // 1 insertion vs 1
      (4L, "abcdefgh"),     // 2 deletions vs 1
      (5L, "zzzzzzzzzz"))   // unrelated
      .toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("dist")).toMap
    assert(got((1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 1L)
    assert(got((1L, 4L)) == 2L)
    assert(got((2L, 3L)) == 2L) // X-sub + k-insert
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("editDistancePairs: only the titleLen prefix is compared") {
    val docs = Seq(
      (1L, "same prefix same prefix same pre" + "TAIL-A completely different"),
      (2L, "same prefix same prefix same pre" + "TAIL-B something else entirely"))
      .toDF("doc_id", "text")
    val got = EditDistance.editDistancePairs(docs).collect()
    assert(got.length == 1 && got.head.getAs[Long]("dist") == 0L)
  }

  test("editDistancePairs: exhaustive differential vs brute-force cross join") {
    // driver-corpus titles + injected typos: the filtered join must
    // find EXACTLY the pairs the quadratic reference finds
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = EditDistance.withTypoDocs(base)
    val got = EditDistance.editDistancePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    val titles = corpus
      .select(col("doc_id"), expr("substring(text, 1, 32)").as("title"))
      .filter(length(col("title")) >= 8)
    val brute = titles.toDF("a", "ta")
      .crossJoin(titles.toDF("b", "tb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the injected typos guarantee a non-trivial set
  }

  test("gramFreqCap: capped run equals brute force (fallback-heavy corpus)") {
    // the tiny synthetic vocabulary makes EVERY gram hot at cap=16, so
    // this drives essentially the whole corpus through the
    // length-banded fallback — the path the default cap never takes
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = EditDistance.withTypoDocs(base)
    val got = EditDistance.editDistancePairs(corpus, gramFreqCap = 16L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    val uncapped = EditDistance.editDistancePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist"))).toSet
    assert(got == uncapped)
    assert(got.nonEmpty)
  }

  test("gramFreqCap: mixed safe/unsafe corpus — both paths, exact result") {
    // hot-gram docs (shared low-variety titles, typo pair among them)
    // go unsafe at cap=8; the hex-title docs keep >= 5 sub-cap grams
    // and stay on the prefix join; a typo pair exists in EACH class
    val hotDocs = (1L to 20L).map(i => (i, "aaab aaab aaab aaab aaab aaab")) ++
      Seq((100L, "aaab aaab aaab aaab aaab aaaX")) // dist-1 partner of the block
    val safeDocs = (200L until 220L).map(i =>
      (i, f"uq${i * 2654435761L % 100000007L}%x unique title row $i%d")) ++
      Seq((300L, f"uq${210L * 2654435761L % 100000007L}%x unique title row 21Z"))
    val corpus = (hotDocs ++ safeDocs).toDF("doc_id", "text")
    val capped = EditDistance.editDistancePairs(corpus, gramFreqCap = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val titles = corpus
      .select(col("doc_id"), expr("substring(text, 1, 32)").as("title"))
      .filter(length(col("title")) >= 8)
    val brute = titles.toDF("a", "ta")
      .crossJoin(titles.toDF("b", "tb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == brute)
    // the hot block collapses at dist 0 and its typo partner at dist 1:
    // pairs that only the fallback can find at this cap
    assert(capped.contains((1L, 2L, 0L)) && capped.contains((1L, 100L, 1L)))
  }

  test("withTypoDocs: injected copies are within d of their source title") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = EditDistance.withTypoDocs(base)
    val t = corpus.select(col("doc_id"),
      expr("substring(text, 1, 32)").as("title"))
    val joined = t.filter(col("doc_id") >= 400000L)
      .withColumn("orig_id",
        when(col("doc_id") >= 600000L, col("doc_id") - 600000L)
          .otherwise(col("doc_id") - 400000L))
      .join(t.toDF("orig_id", "orig_title"), "orig_id")
    val dists = joined
      .select(levenshtein(col("title"), col("orig_title")).as("d"))
      .collect().map(_.getInt(0))
    assert(dists.nonEmpty && dists.forall(_ <= 2))
  }
}
