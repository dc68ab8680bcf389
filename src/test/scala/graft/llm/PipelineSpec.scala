package graft.llm

import graft.SparkSpec

/** End-to-end training-data pipeline composition. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("qualityCalibration: rank permille within source, ties share, singleton 0") {
    val docs = Seq(
      (1L, "aa bb cc", "s1"),
      (2L, "aa aa aa aa", "s1"),
      (3L, "the of and is a the of", "s1"),
      (4L, "aa bb cc", "s1"), // same text as doc 1 → same quality: a tie
      (5L, "only document of its source", "s2")
    ).toDF("doc_id", "text", "source")
    // reference: RANK semantics over the engine's own (oracle-checked)
    // quality scores — strictly-lower count, ties share
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("quality")).toMap
    val s1 = Seq(1L, 2L, 3L, 4L).map(q)
    def expectPm(id: Long): Long =
      1000L * s1.count(_ < q(id)) / (s1.length - 1)
    val got = Pipeline.qualityCalibration(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Long]("quality"),
          r.getAs[Long]("calib_pm")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(got(id)._2 === q(id))
      assert(got(id)._3 === expectPm(id), s"doc $id")
    }
    // the tie shares one calibrated value
    assert(got(1L)._3 === got(4L)._3)
    // a single-doc source calibrates to 0, not a division by zero
    assert(got(5L) === (("s2", q(5L), 0L)))
  }

  test("trainingPipeline: filters, dedups to canonical, redacts, counts") {
    val docs = Seq(
      // survives: English, plenty of unique words + stopwords, has PII
      (1L, "the quick brown fox is a friend of the lazy dog and visits https://ex.test/x daily"),
      // exact duplicate (different id) -> only id 1 survives, n_copies 2
      (7L, "the quick brown fox is a friend of the lazy dog and visits https://ex.test/x daily"),
      // Spanish -> filtered by language
      (2L, "el perro y la casa de los amigos que viven aqui"),
      // too short -> quality floor
      (3L, "hi"),
      // English, no dup
      (4L, "a model of the data and a story of the runs is written here"))
      .toDF("doc_id", "text")
    val got = Pipeline.trainingPipeline(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("quality"))).toMap
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L)._1 == 2L) // its content class had 2 copies
    assert(got(4L)._1 == 1L)
    assert(got.values.forall(_._2 >= 400L))
    // redaction happened before token stats: the URL collapsed to <URL>
    val row1 = Pipeline.trainingPipeline(docs)
      .filter($"doc_id" === 1L).collect().head
    val rawWs = docs.filter($"doc_id" === 1L)
      .select(org.apache.spark.sql.functions.size(
        TextFns.tokens($"text"))).collect().head.getInt(0)
    assert(row1.getAs[Long]("n_ws_tokens") == rawWs) // URL was one token, stays one (<URL>)
    assert(row1.getAs[Long]("n_chars") < 90)         // but the text got shorter
  }

  test("curationFunnel: monotone stage counts, dup class counted once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick fox and the dog is here with many more of the words " * 2),
      (2L, "the quick fox and the dog is here with many more of the words " * 2), // dup of 1
      (3L, "el que la los de"),          // not english
      (4L, "x"),                         // no markers -> und
      (5L, "the the the")                // en but low quality
    ).toDF("doc_id", "text")
    val got = Pipeline.curationFunnel(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("0_input") == 5L)
    assert(got("1_lang") < got("0_input") && got("2_quality") <= got("1_lang"))
    assert(got("2_quality") >= 2L)
    assert(got("3_dedup") == got("2_quality") - 1L) // docs 1,2 share one class
  }

  test("curriculumShards: two-phase rank equals the global window rank") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Pipeline.curriculumShards(docs, shardSize = 7L)
    // reference: the naive single-partition global window
    val ref = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"),
        row_number().over(
          Window.orderBy(col("quality").desc, col("doc_id"))).cast("long")
          .as("rank"))
      .withColumn("shard", expr("(rank - 1) div 7"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("rank"), r.getAs[Long]("shard"))).toSet ==
      ref.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getAs[Long]("shard"))).toSet)
    // ranks are a permutation of 1..N; shards are contiguous rank runs
    val n = docs.count()
    val ranks = got.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n).toSeq)
  }
}
