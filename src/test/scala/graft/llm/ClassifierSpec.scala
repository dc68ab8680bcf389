package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.SparkSpec

import scala.jdk.CollectionConverters._

class ClassifierSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t) }.asJava,
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))

  // A crisply separable toy corpus. The quality heuristic (length,
  // uniqueness, stopword permilles, threshold 470) labels the
  // stopword-rich long docs hq=1 and the repetitive stopword-free docs
  // hq=0; the token "good" appears only in positives, "spam" only in
  // negatives.
  private val posText =
    "the good cat is of a and the dog is a fine good friend indeed " +
      "one two three four five six seven eight nine ten eleven twelve " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val negText = "spam spam spam spam spam spam spam spam"
  private val toy = docsDf(Seq(
    (0L, posText), (1L, posText + " extra"), (2L, posText + " more words"),
    (10L, negText), (11L, negText + " spam"), (12L, negText + " spam spam")))

  test("labels are separable on the toy corpus and weights point the right way") {
    val w = Classifier.tokenWeights(toy).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (goodPos, goodNeg, goodW) = w("good")
    val (spamPos, spamNeg, spamW) = w("spam")
    assert(goodPos > 0 && goodNeg == 0 && goodW > 0,
      s"'good' should be a positive-class token: $goodPos/$goodNeg/$goodW")
    assert(spamPos == 0 && spamNeg > 0 && spamW < 0,
      s"'spam' should be a negative-class token: $spamPos/$spamNeg/$spamW")
  }

  test("scoreDocs predicts the teacher label perfectly on separable data") {
    val out = Classifier.scoreDocs(toy).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (id, pred, heur) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(pred == heur, s"doc $id: pred=$pred heur=$heur")
      assert(heur == (if (id < 10) 1L else 0L), s"doc $id mislabeled by teacher")
    }
  }

  test("scoreWith a frozen weight table: OOV tokens score 0, empty doc keeps a row") {
    val weights = Classifier.tokenWeights(toy)
    val fresh = docsDf(Seq(
      (100L, "good unseen tokens here"), // 'good' known-pos, rest OOV
      (101L, "")))                       // token-less
    val out = Classifier.scoreWith(fresh, weights).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (n100, s100) = out(100L)
    assert(n100 == 4 && s100 > 0,
      s"OOV-heavy doc should score exactly its known tokens' weight: $n100/$s100")
    val (n101, s101) = out(101L)
    assert(n101 == 0 && s101 == 0, s"empty doc must keep a zero row: $n101/$s101")
  }

  private def scoredDf(rows: Seq[(Long, Long, Long)]) = // (doc_id, score, hq)
    spark.createDataFrame(
      rows.map { case (id, s, h) => Row(id, 0L, s, if (s > 0) 1L else 0L, h) }.asJava,
      StructType(Seq(
        StructField("doc_id", LongType), StructField("n_tokens", LongType),
        StructField("score_ppm", LongType), StructField("pred_hq", LongType),
        StructField("heur_hq", LongType))))

  test("auc: perfect separation = 1000, all-tied scores = 500") {
    val perfect = scoredDf(Seq((1L, 10L, 1L), (2L, 9L, 1L), (3L, -1L, 0L), (4L, -2L, 0L)))
    val p = Classifier.auc(perfect).collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((2L, 2L, 1000L)))
    val tied = scoredDf(Seq((1L, 5L, 1L), (2L, 5L, 1L), (3L, 5L, 0L), (4L, 5L, 0L)))
    assert(Classifier.auc(tied).collect().head.getLong(2) == 500L)
  }

  test("auc: hand-computed mixed case with a cross-class tie") {
    // ascending scores: 1(neg) 2(pos) 2(neg) 3(pos); avg ranks 1, 2.5, 2.5, 4
    // R+ = 2.5 + 4 = 6.5; U = 6.5 - 3 = 3.5; AUC = 3.5/4 = 0.875
    val m = scoredDf(Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 3L, 1L)))
    assert(Classifier.auc(m).collect().head.getLong(2) == 875L)
  }

  test("auc is NULL when a class is absent") {
    val onePos = scoredDf(Seq((1L, 1L, 1L), (2L, 2L, 1L)))
    assert(Classifier.auc(onePos).collect().head.isNullAt(2))
  }

  test("prCurve: confusion cells are exhaustive and monotone in the threshold") {
    val out = Classifier.prCurve(Classifier.scoreDocs(toy)).collect()
      .sortBy(_.getLong(1 - 1)) // by thr
    assert(out.length == Classifier.PrThresholds.length)
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == 6L,
        s"cells must partition the corpus: $r")
    }
    // tp is non-increasing as the threshold rises
    val tps = out.map(_.getLong(1)).toSeq
    assert(tps == tps.sorted.reverse, s"tp not monotone: $tps")
  }

  test("scoreExpr under frozen full-vocab weights equals scoreWith exactly") {
    val weights = Classifier.freezeWeights(toy, topK = 10000)
    val viaExpr = toy.select(col("doc_id"),
      Classifier.scoreExpr(col("text"), weights).as("score_ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Classifier.scoreWith(toy, Classifier.tokenWeights(toy))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaExpr == viaAgg, s"expr=$viaExpr agg=$viaAgg")
  }

  test("freezeWeights keeps the topK weights by magnitude") {
    val all = Classifier.tokenWeights(toy).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val k = 3
    val frozen = Classifier.freezeWeights(toy, topK = k)
    assert(frozen.size == k)
    val keptMin = frozen.values.map(math.abs).min
    val droppedMax = all.filterNot { case (t, _) => frozen.contains(t) }
      .values.map(math.abs).max
    assert(keptMin >= droppedMax,
      s"kept |$keptMin| should dominate dropped |$droppedMax|")
  }

  test("driver corpus: distilled classifier beats the majority baseline") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists,
      "driver testdata not present")
    val docs = graft.Tables.documents(spark, sfDir)
    val out = Classifier.scoreDocs(docs).collect()
    val n = out.length.toDouble
    val pos = out.count(_.getLong(4) == 1L)
    val agree = out.count(r => r.getLong(3) == r.getLong(4))
    val majority = math.max(pos, n - pos) / n
    assert(agree / n > majority,
      s"train-set agreement ${agree / n} should beat majority $majority")
    // the heuristic is stopword-driven; the student must discover that
    val w = Classifier.tokenWeights(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val topTokens = w.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(topTokens.exists(TextAnalysis.Stopwords.contains),
      s"expected a stopword among the top weights, got $topTokens")
  }

  test("lift: a perfect ranking concentrates all positives in the top bucket") {
    import spark.implicits._
    val scored = Seq(
      (0L, 400L, 1L), (1L, 300L, 1L), (2L, 200L, 0L), (3L, 100L, 0L))
      .toDF("doc_id", "score_ppm", "heur_hq")
    val got = Classifier.lift(scored, nBuckets = 2).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pos_rate_pm"),
          Option(r.getAs[java.lang.Long]("lift_pm")).map(_.toLong))).toMap
    // global rate 1/2: top bucket rate 1 -> lift 2000, bottom -> 0
    assert(got(1L) == (2L, 2L, 1000L, Some(2000L)))
    assert(got(2L) == (2L, 0L, 0L, Some(0L)))
  }

  test("lift: NULL lift when the sample has no positives") {
    import spark.implicits._
    val scored = Seq((0L, 10L, 0L), (1L, 5L, 0L))
      .toDF("doc_id", "score_ppm", "heur_hq")
    val got = Classifier.lift(scored, nBuckets = 2).collect()
    got.foreach(r => assert(r.isNullAt(r.fieldIndex("lift_pm"))))
  }
}
