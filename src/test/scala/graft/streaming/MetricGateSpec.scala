package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Frozen median/MAD outlier gate: boundary semantics, unknown-type
  * pass-through, statelessness, and batch parity. */
class MetricGateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("keepExpr: 3*MAD boundary inclusive, unknown types pass") {
    val profile = Map("m" -> ((2000000L, 1000000L)))
    val df = Seq(
      ("m", 2.0, true),    // at median
      ("m", 5.0, true),    // dev exactly 3*MAD — inclusive
      ("m", 5.001, false), // just past
      ("m", -1.001, false),
      ("other", 99.9, true)) // no profile — conservative keep
      .toDF("event_type", "value", "want")
    val got = df.withColumn("keep",
      MetricGate.keepExpr(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"), profile))
      .collect().map(r => (r.getAs[Boolean]("want"), r.getAs[Boolean]("keep")))
    got.foreach { case (want, keep) => assert(want == keep) }
  }

  test("outlierGate streams statelessly and matches the batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "event_type", "value")
    val profile = MetricGate.freezeProfile(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
    assert(profile.nonEmpty)
    // batch reference: rows the gate should keep
    val wantKept = batch
      .filter(MetricGate.keepExpr(
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"), profile))
      .select("event_id").as[Long].collect().toSet
    val rows = batch.as[(Long, String, Double)].collect().toSeq
    assert(wantKept.size < rows.size, "profile must actually drop outliers")
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows: _*)
    val stream = mem.toDF().toDF("event_id", "event_type", "value")
    val gated = MetricGate.outlierGate(stream, profile)
    assert(gated.isStreaming)
    val q = gated.writeStream.trigger(Trigger.AvailableNow()).format("memory")
      .queryName("metric_gate_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    // stateless: no state store rows in any progress sample
    assert(q.lastProgress == null ||
      q.recentProgress.forall(_.stateOperators.isEmpty))
    val kept = spark.table("metric_gate_out")
      .select("event_id").as[Long].collect().toSet
    assert(kept == wantKept)
  }
}
