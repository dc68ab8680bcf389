package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.AnnIndex

/** The recluster-hysteresis maintenance decision, exercised ONLINE —
  * the streaming twin of the `ann_maintenance_plan` oracle lifecycle
  * (SparkEntry): embeddings arrive as micro-batches, each trigger
  * appends against the frozen centroids and polls
  * [[graft.llm.AnnIndex.maintenancePlan]] exactly as a maintenance
  * scheduler would, and the decision sequence must reproduce the
  * oracle-checked stages — drift fires `recluster`, the armed
  * post-rebalance baseline suppresses the still-high intrinsic skew
  * (`none`, the r15 hysteresis), and NEW drift past baseline × 1.25
  * re-triggers. Same composition as the oracle fixture (two drifted
  * orthant slices + the takedown of the first, recluster, a third
  * slice) so the decision bits here are the ones DuckDB already
  * replays; what this spec adds is that the loop holds under
  * foreachBatch semantics — per-trigger appends, the poll-then-act
  * scheduler pattern, and an in-loop delete.
  *
  * Not a generational (hot/cold) ANN: that is deliberately scoped out
  * in [[graft.llm.AnnIndex.recluster]]'s doc — cell assignments depend
  * on trained parameters, so no queryGen ≡ query theorem exists; the
  * online maintenance story for ANN is THIS loop (append cheap, poll,
  * recluster when drift says so), not generations. */
class AnnMaintenanceStreamSpec extends SparkSpec {

  test("online loop: drift fires recluster, hysteresis then holds, new drift re-triggers") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb
      .filter(col("vec_id") < 16 || pmod(col("vec_id"), lit(4)) === 0)
      .select("vec_id", "embedding")
    def drifted(m: Int, off: Long): Seq[(Long, Array[Float])] =
      emb.filter(pmod(col("vec_id"), lit(4)) === m)
        .select((col("vec_id") + off).as("vec_id"),
          transform(col("embedding"), x => abs(x)).as("embedding"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val name = "ann_stream_maint"
    AnnIndex.build(base, name)

    implicit val sqlCtx = spark.sqlContext
    val sess = spark
    import sess.implicits._
    val mem = MemoryStream[(Long, Array[Float])]
    val feed = mem.toDF().toDF("vec_id", "embedding")
    val takedown = drifted(1, 100000L).map(_._1)
    val decisions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        AnnIndex.append(batch, name)
        // batch 1 carries the takedown of batch 0's slice — the oracle
        // lifecycle's delete, arriving mid-stream as it would in prod
        if (batchId == 1L) AnnIndex.delete(takedown.toDF("vec_id"), name)
        val plan = AnnIndex.maintenancePlan(batch.sparkSession, name)
          .collect().head.getString(2)
        decisions += ((batchId, plan))
        if (plan == "recluster") {
          AnnIndex.recluster(batch.sparkSession, name, refineIters = 1)
          decisions += ((batchId,
            "after:" + AnnIndex.maintenancePlan(batch.sparkSession, name)
              .collect().head.getString(2)))
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ann_maint_ckpt").toString)
      .start()
    try {
      mem.addData(drifted(1, 100000L): _*); q.processAllAvailable()
      mem.addData(drifted(2, 200000L): _*); q.processAllAvailable()
      mem.addData(drifted(3, 300000L): _*); q.processAllAvailable()
    } finally q.stop()

    val byBatch = decisions.groupBy(_._1).view.mapValues(_.map(_._2).toList)
    // batch 1 = the oracle's stage 2_drifted_deleted: must fire, and
    // the recluster must arm the baseline that reads `none` right after
    assert(byBatch(1L) == List("recluster", "after:none"),
      s"batch 1 must recluster then read none under the armed baseline; got $decisions")
    // batch 2 = stage 5_redrifted: new drift onto the refined layout
    // re-arms the trigger past baseline x 1.25, and the loop rebalances
    // and settles again
    assert(byBatch(2L) == List("recluster", "after:none"),
      s"batch 2's fresh drift must re-trigger; got $decisions")
    // the index the loop maintained really holds every admitted vector
    val n = spark.table(AnnIndex.cellsTable(name)).count()
    val expected = base.count() +
      drifted(2, 200000L).size + drifted(3, 300000L).size
    assert(n == expected,
      s"recluster subsumes the purge: ${takedown.size} tombstoned rows " +
        s"gone, survivors intact (got $n, expected $expected)")
  }
}
