package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** P-3/P-4/P-5/P-7 cleaning chains vs FIXTURES.md A.1 hand fixtures. */
class TextOpsSpec extends SparkSpec {

  test("cleanTweetText: strip non-ascii, URLs after punct-strip, @mention->Foo, leading Foo") {
    val in = Seq(
      "Loving the new #Spark release! @databricks rocks http://t.co/x RT",
      "@lead hello",
      "#AI. Is this good? Maybe. #ml #AI",
      "#copa final tonight!! 🎉🎉 #футбол")
    val got = evalText[String](in)(TextOps.cleanTweetText(col("text")))
    // step-1 strips '#', '/', ':', '?' and emoji (class keeps [a-zA-Z0-9\s.,!@]);
    // RT-words die; URL remnant "httpt.cox" -> step-2 kills http\S+.
    // NOTE '#' is stripped from TEXT — hashtags are extracted from the RAW
    // text before cleaning, exactly like the reference (:217 vs :224).
    assert(got(0) == "Loving the new Spark release! Foo rocks  ")
    assert(got(1) == " hello") // @lead -> Foo, then leading Foo stripped
    assert(got(2) == "AI. Is this good Maybe. ml AI")
    assert(got(3) == "copa final tonight!!  ")
  }

  test("extractHashtags keeps only #-tokens longer than 1 char") {
    val got = evalText[collection.Seq[String]](Seq(
      "a #tag #x ## # b #mid,dle", "no tags", "#solo"))(
      TextOps.extractHashtags(col("text")))
    assert(got(0) == Seq("#tag", "#x", "##", "#mid,dle"))
    assert(got(1) == Seq())
    assert(got(2) == Seq("#solo"))
  }

  test("cleanHashtag strips RT-words and non-alphanumerics, keeps #") {
    val got = evalText[String](Seq("#mid,dle!", "#startRT", "#fooRTbar", "#ok"))(
      TextOps.cleanHashtag(col("text")))
    // \w*RT eats the whole prefix through RT; remaining chars filtered
    assert(got == Seq("#middle", "#", "#bar", "#ok"))
  }

  test("cleanHashtagSimple is the reference's near-no-op literal sequence") {
    val got = evalText[String](Seq("#a:b,c!", "#a \t\n:,!b"))(
      TextOps.cleanHashtagSimple(col("text")))
    assert(got(0) == "#a:b,c!") // pattern never matches a lone ':' etc.
    // \s (class) + literal "\t\n:,!" — only the full 6-char sequence dies
    assert(got(1) == "#ab")
  }

  test("native cleanTweetText equals the 4-regex column twin on adversarial strings") {
    // hit every scanner edge: RT at run start/middle/end, multiple RTs
    // in one run (rightmost wins), '_' (word char but not keep-class),
    // http with/without \S following, @ with/without word run, literal
    // "Foo" prefixes, Java-\s chars incl. vertical tab, surrogate
    // pairs, and the keep-class punctuation
    val tok = Gen.oneOf("RT", "xRT", "RTx", "aRTbRTc", "a_RT", "_",
      "http", "http://t.co/x", "httpx", "xhttpy", "http ", "@", "@user",
      "@RT", "Foo", "FooBar", ".,!@", "#tag", "é", "漢", "😀", "",
      "\t", "\u000b", "", " ", "plain", "a.b,c!d")
    val text = Gen.listOf(tok).map(_.mkString(" "))
    val samples = Gen.listOfN(500, text).apply(Gen.Parameters.default, Seed(33L)).get ++
      Seq("", "Foo", "FooFoo", "@x", "RT", "_RT_", "aRT", "RTRT",
        "httpx", "httphttp y", "@_", "x@y", "😀RT", "a😀RT",
        "Foo@bar", "@fooRT http://x RT")
    val rows = textDf("text", samples).select(
      TextOps.cleanTweetText(col("text")).as("n"),
      TextOps.cleanTweetTextHof(col("text")).as("h"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch for '${r.getString(2)}': native='${r.getString(0)}' regex='${r.getString(1)}'")
    }
  }

  test("clean scanners equal String.replaceAll per stage on 10k fuzzed strings") {
    // direct JVM-level differential fuzz: each linear scanner vs the
    // exact Java regex it replaces, over a hostile alphabet (RT
    // fragments, '_', http prefixes, '@', Foo letters, Java-\s chars
    // incl. vertical tab, punctuation, and RAW surrogate halves so
    // broken pairs are exercised too)
    val units: Array[String] = Array(
      "a", "b", "R", "T", "_", "0", "9", "F", "o", "h", "t", "p",
      ".", ",", "!", "@", ":", "/", "#", " ", "\t", "\n", "",
      "\f", "\r", "é", "漢", "\ud83d", "\ude00", "😀")
    val rnd = new scala.util.Random(424242L)
    var i = 0
    while (i < 10000) {
      val n = rnd.nextInt(30)
      val s = Seq.fill(n)(units(rnd.nextInt(units.length))).mkString
      assert(TextCleanOps.stage1(s) ==
        s.replaceAll("(\\b\\w*RT)|[^a-zA-Z0-9\\s.,!@]", ""), s"stage1 on ${s.getBytes("UTF-16").toSeq}")
      assert(TextCleanOps.stage2(s) == s.replaceAll("(http\\S+)", ""),
        s"stage2 on ${s.getBytes("UTF-16").toSeq}")
      assert(TextCleanOps.stage3(s) == s.replaceAll("(@\\w+)", "Foo"),
        s"stage3 on ${s.getBytes("UTF-16").toSeq}")
      assert(TextCleanOps.stage4(s) == s.replaceAll("^(Foo)", ""),
        s"stage4 on ${s.getBytes("UTF-16").toSeq}")
      i += 1
    }
  }

  test("native extractHashtags equals the HOF column twin on adversarial strings") {
    val tok = Gen.oneOf("#tag", "#", "##", "#a", "# b", "", " ", "#x\ty",
      "x#y", "#漢字", "#😀", "#e", "plain")
    val text = Gen.listOf(tok).map(_.mkString(" "))
    val samples = Gen.listOfN(300, text).apply(Gen.Parameters.default, Seed(17L)).get
    val rows = textDf("text", samples).select(
      TextOps.extractHashtags(col("text")).as("n"),
      TextOps.extractHashtagsHof(col("text")).as("h"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getAs[collection.Seq[String]](0) == r.getAs[collection.Seq[String]](1),
        s"mismatch for '${r.getString(2)}'")
    }
  }

  test("property: extracted hashtags all start with '#' and survive re-cleaning") {
    val tok = Gen.oneOf("#tag", "word", "#a", "#", "x#y", "#B2", "RT")
    val text = Gen.listOf(tok).map(_.mkString(" "))
    val samples = Gen.listOfN(200, text).apply(Gen.Parameters.default, Seed(11L)).get
    val got = evalText[collection.Seq[String]](samples)(TextOps.extractHashtags(col("text")))
    assert(got.flatten.forall(t => t.startsWith("#") && t.length > 1))
  }

  test("property: tokenize+filter row count equals hashtag occurrences") {
    val samples = Gen.listOfN(100,
      Gen.listOf(Gen.oneOf("#t1", "#t2", "w")).map(_.mkString(" ")))
      .apply(Gen.Parameters.default, Seed(13L)).get
    val expected = samples.map(_.split(" ").count(t => t.startsWith("#") && t.length > 1))
    val got = evalText[collection.Seq[String]](samples)(TextOps.extractHashtags(col("text")))
    assert(got.map(_.size) == expected)
  }
}
