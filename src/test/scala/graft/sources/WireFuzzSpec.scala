package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.WireCodec
import graft.sources.wire.WireTable

/** Differential fuzz: the graft-wire DSv2 reader vs the
  * `textFile + WireCodec.decodeMetric` column twin, over adversarial
  * content (delimiter fragments, empty slots, wrong slot counts,
  * multibyte and astral chars, numeric look-alikes) and random
  * byte-range split sizes. The two paths must agree row-for-row at
  * every split granularity — this is the property the hand-written
  * boundary tests sample; the fuzz sweeps it. */
class WireFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val field = Gen.oneOf(
    "", " ", "x", "#tag", "3.5", "-2", "not-a-number", "1e3", "2.5e-1",
    "NaN", "Infinity", "0x1f", " 3.5", "3.5 ", "é漢", "a😀b",
    "/TLOC/", "a /TLOC b", "x\ty", "\"q\"", "\\back")

  private val line: Gen[String] = Gen.frequency(
    // well-formed-ish: 0..6 fields joined by the real delimiter
    8 -> Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, field).map(_.mkString(WireTable.Delim))),
    // raw junk
    2 -> Gen.oneOf("", "   ", "no delim here", "a /TLOC/", "/TLOC/ b",
      "x /TLOC/ y /TLOC/ z /TLOC/ w /TLOC/ extra /TLOC/ more"))

  test("reader equals the column twin on adversarial content at any split size") {
    val lines = Gen.listOfN(300, line)
      .apply(Gen.Parameters.default, Seed(20260812L)).get
    val dir = Files.createTempDirectory("wire_fuzz")
    Files.write(dir.resolve("fuzz.txt"),
      lines.mkString("\n").getBytes("UTF-8"))

    val twin = spark.read.textFile(dir.toString).toDF("line")
      .select(WireCodec.decodeMetric(col("line")).as("m"))
      .select("m.hashtag", "m.sentiment_score", "m.sentiment_type", "m.country")
      .collect().map(_.toSeq.map(v => if (v == null) "␀" else v.toString))
      .sortBy(_.mkString("|"))

    val contentBytes = lines.mkString("\n").getBytes("UTF-8").length
    for (split <- Seq(3, 17, 64, 255, 1024, contentBytes + 7)) {
      val got = spark.read.format("graft-wire")
        .option("maxSplitBytes", split.toString).load(dir.toString)
        .collect().map(_.toSeq.map(v => if (v == null) "␀" else v.toString))
        .sortBy(_.mkString("|"))
      assert(got.length == twin.length, s"split=$split row count")
      assert(got.toSeq == twin.toSeq, s"split=$split")
    }
  }

  test("write-read roundtrip under fuzz equals the encode-decode column twin") {
    val rows = Gen.listOfN(150, Gen.zip(field, Gen.option(Gen.chooseNum(-99.5, 99.5)), field, field))
      .apply(Gen.Parameters.default, Seed(4242L)).get
      .map { case (h, sc, t, c) =>
        (h, sc.map(java.lang.Double.valueOf).orNull, t, c) }
    val df = rows.toDF("hashtag", "sentiment_score", "sentiment_type", "country")
    val dir = Files.createTempDirectory("wire_fuzz_w").toString
    df.write.format("graft-wire").mode("append").save(dir)
    val got = spark.read.format("graft-wire").load(dir)
      .collect().map(_.toSeq.map(v => if (v == null) "␀" else v.toString))
      .sortBy(_.mkString("|"))
    val twin = df
      .select(WireCodec.decodeMetric(WireCodec.encodeMetric(
        col("hashtag"), col("sentiment_score"),
        col("sentiment_type"), col("country"))).as("m"))
      .select("m.hashtag", "m.sentiment_score", "m.sentiment_type", "m.country")
      .collect().map(_.toSeq.map(v => if (v == null) "␀" else v.toString))
      .sortBy(_.mkString("|"))
    assert(got.toSeq == twin.toSeq)
  }
}
