package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.WireCodec

class WireSourceSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "#spark /TLOC/ 3.5 /TLOC/ positive /TLOC/ USA",
    "#flink /TLOC/ 1.0 /TLOC/ negative /TLOC/ India",
    "#beam /TLOC/ not-a-number /TLOC/ neutral /TLOC/ USA", // score -> NULL
    "#short /TLOC/ 2.0",                                   // missing slots -> NULL
    "#trail /TLOC/ 4.0 /TLOC/ positive /TLOC/ ",           // trailing empty kept
    "no delimiter at all")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("wire_src")
    Files.write(d.resolve("a.txt"),
      String.join("\n", lines.take(3): _*).getBytes("UTF-8"))
    Files.write(d.resolve("b.txt"),
      String.join("\n", lines.drop(3): _*).getBytes("UTF-8"))
    d.toString
  }

  private def wire: DataFrame = spark.read.format("graft-wire").load(dir)

  private def scanOf(df: DataFrame): BatchScanExec = {
    df.collect()
    planNodes(df.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b }.get
  }

  test("decode is bit-identical to the WireCodec column twin") {
    val got = wire.collect().map(_.toSeq).toSet
    val twin = spark.read.textFile(dir).toDF("line")
      .select(WireCodec.decodeMetric(col("line")).as("m"))
      .select("m.hashtag", "m.sentiment_score", "m.sentiment_type", "m.country")
    assert(got == twin.collect().map(_.toSeq).toSet)
    assert(got.size == 6)
    // spot-check the edge rows
    assert(got.contains(Seq("#beam", null, "neutral", "USA")))
    assert(got.contains(Seq("#short", 2.0, null, null)))
    assert(got.contains(Seq("#trail", 4.0, "positive", "")))
    assert(got.contains(Seq("no delimiter at all", null, null, null)))
  }

  test("column pruning reaches the reader: scan outputs only requested slots") {
    val df = wire.select("hashtag")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("hashtag"))
    assert(df.collect().length == 6)
  }

  test("string-equality filters push into the reader and stay correct") {
    val df = wire.filter($"country" === "USA")
    val pushed = scanOf(df).scan.asInstanceOf[graft.sources.wire.WireScan].pushed
    assert(pushed.map(_.toString).toSeq ==
      Seq("""EqualTo(country,USA)"""))
    val got = df.select("hashtag").as[String].collect().toSet
    assert(got == Set("#spark", "#beam"))
    // unsupported predicate shapes still evaluate correctly post-scan
    val ge = wire.filter($"sentiment_score" >= 2.0)
      .select("hashtag").as[String].collect().toSet
    assert(ge == Set("#spark", "#short", "#trail"))
  }

  test("one input partition per file") {
    assert(wire.rdd.getNumPartitions == 2)
  }

  test("byte-range splits tile a file exactly — boundaries, multibyte, no loss/dup") {
    val d = Files.createTempDirectory("wire_split")
    val n = 200
    val content = (0 until n)
      .map(i => s"#t$i /TLOC/ $i.5 /TLOC/ s /TLOC/ cé$i") // é: 2-byte UTF-8
      .mkString("\n")
    Files.write(d.resolve("big.txt"), content.getBytes("UTF-8"))
    val whole = spark.read.format("graft-wire").load(d.toString)
      .collect().map(_.toSeq).toSet
    assert(whole.size == n)
    for (split <- Seq(7, 64, 101, 1 << 20)) {
      val df = spark.read.format("graft-wire")
        .option("maxSplitBytes", split.toString).load(d.toString)
      if (split < content.length) assert(df.rdd.getNumPartitions > 1)
      assert(df.count() == n, s"split=$split lost or duplicated rows")
      assert(df.collect().map(_.toSeq).toSet == whole, s"split=$split")
    }
  }

  test("streaming sink: epochs write immutable files the streaming source tails") {
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("wire_pipe_src")
    val dst = Files.createTempDirectory("wire_pipe_dst").toString
    Files.write(src.resolve("in.txt"),
      "#in /TLOC/ 9.0 /TLOC/ positive /TLOC/ USA".getBytes("UTF-8"))
    val q = spark.readStream.format("graft-wire").load(src.toString)
      .writeStream.trigger(Trigger.AvailableNow()).format("graft-wire")
      .option("checkpointLocation",
        Files.createTempDirectory("wire_pipe_ckpt").toString)
      .option("path", dst)
      .start()
    q.awaitTermination(60000)
    val back = spark.read.format("graft-wire").load(dst)
    assert(back.select("hashtag").as[String].collect().toSeq == Seq("#in"))
    val names = new java.io.File(dst).listFiles().map(_.getName).filter(_.endsWith(".txt"))
    assert(names.nonEmpty && names.forall(_.startsWith("epoch-")))
  }

  test("streaming read: new files only, offsets survive restart") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("wire_stream")
    val ckpt = Files.createTempDirectory("wire_ckpt").toString
    Files.write(d.resolve("f1.txt"),
      "#one /TLOC/ 1.0 /TLOC/ positive /TLOC/ USA".getBytes("UTF-8"))

    def drain(): Seq[String] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("graft-wire").load(d.toString)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("hashtag").collect().foreach(r => got.add(r.getString(0)))
        }
        .start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq
    }
    assert(drain() == Seq("#one"))

    // a second file arrives; a restarted query reads ONLY the new file
    Files.write(d.resolve("f2.txt"),
      "#two /TLOC/ 2.0 /TLOC/ negative /TLOC/ India".getBytes("UTF-8"))
    assert(drain() == Seq("#two"))
  }

  test("write side: roundtrip keeps WireCodec's null-coalescing semantics") {
    val outDir = Files.createTempDirectory("wire_out").toString
    val rows = Seq(
      ("#a", Some(3.5), "positive", "USA"),
      ("#b", None, "neutral", "India"),          // null score -> "" -> NULL
      (null, Some(1.0), null, "Japan")           // null strings -> "" on wire
    ).toDF("hashtag", "sentiment_score", "sentiment_type", "country")
    rows.write.format("graft-wire").mode("append").save(outDir)
    val back = spark.read.format("graft-wire").load(outDir)
      .collect().map(_.toSeq).toSet
    // null STRINGS come back as "" (the wire cannot tell them apart —
    // same loss as WireCodec encode->decode); null DOUBLES round-trip
    assert(back == Set(
      Seq("#a", 3.5, "positive", "USA"),
      Seq("#b", null, "neutral", "India"),
      Seq("", 1.0, "", "Japan")))
    // the on-disk lines are exactly the encodeMetric rendering
    val twin = rows.select(WireCodec.encodeMetric(
        col("hashtag"), col("sentiment_score"),
        col("sentiment_type"), col("country")).as("line"))
      .as[String].collect().toSet
    val disk = spark.read.textFile(outDir).collect().toSet
    assert(disk == twin)
  }
}
