package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance driver's POLICY edges — the lifecycle itself is
  * covered end-to-end by GenerationalLshSpec and DocStreamSpec; this
  * pins the decisions around it. */
class LshMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private class DeferredExecutor extends java.util.concurrent.AbstractExecutorService {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[Runnable]
    def execute(r: Runnable): Unit = q.add(r)
    def runAll(): Unit = {
      var r = q.poll(); while (r != null) { r.run(); r = q.poll() }
    }
    def shutdown(): Unit = ()
    def shutdownNow(): java.util.List[Runnable] =
      java.util.Collections.emptyList[Runnable]()
    def isShutdown: Boolean = false
    def isTerminated: Boolean = false
    def awaitTermination(t: Long, u: java.util.concurrent.TimeUnit): Boolean = true
  }
  private def deferred = new DeferredExecutor

  private def doc(i: Long) =
    (i, s"distinct payload $i with enough meaningful tokens " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")

  test("size-ratio gate: no rotation below hotFractionPm, rotation at it, no-op on empty hot") {
    val name = "lshmaint_ratio"
    // cold = 20 docs, hot = 1 doc -> 50 pm of cold
    LshIndex.buildGen((0L until 20L).map(doc).toDF("doc_id", "text"), name)
    LshIndex.appendHot(Seq(doc(100L)).toDF("doc_id", "text"), name)
    val exec = deferred
    val maint = new LshMaintenance(spark, name, exec)
    // below the 250 pm threshold: no rotate, nothing submitted
    maint.rotateAndStage(spark, hotFractionPm = 250L)
    assert(!maint.mergeInFlight &&
      !spark.catalog.tableExists(LshIndex.mergingSetsTable(name)),
      "hot at 50 pm of cold must not rotate under a 250 pm gate")
    // grow hot past the ratio: 5 hot docs = 250 pm of 20 cold docs
    LshIndex.appendHot((101L until 105L).map(doc).toDF("doc_id", "text"), name)
    maint.rotateAndStage(spark, hotFractionPm = 250L)
    assert(maint.mergeInFlight &&
      spark.catalog.tableExists(LshIndex.mergingSetsTable(name)),
      "hot at exactly the gate must rotate")
    // while in flight, further cadence hits are no-ops
    maint.rotateAndStage(spark, hotFractionPm = 0L)
    assert(spark.table(LshIndex.hotSetsTable(name)).count() == 0L)
    // finish the cycle: all 25 docs fold into cold
    exec.runAll()
    maint.maybeCommit(spark)
    assert(!maint.mergeInFlight)
    spark.catalog.refreshTable(LshIndex.setsTable(name))
    assert(spark.table(LshIndex.setsTable(name)).count() == 25L)
  }

  test("requestPurge defers around an in-flight merge, then runs on the trigger thread") {
    val name = "lshmaint_purge"
    LshIndex.buildGen((0L until 20L).map(doc).toDF("doc_id", "text"), name)
    LshIndex.delete(Seq(3L).toDF("doc_id"), name)
    val exec = deferred
    val maint = new LshMaintenance(spark, name, exec)
    LshIndex.appendHot(Seq(doc(100L)).toDF("doc_id", "text"), name)
    maint.rotateAndStage(spark, hotFractionPm = 0L)
    maint.requestPurge()
    // merge staging (not finished): the purge must DEFER — running it
    // here would race the staged read (the resurrection window
    // purgeDeleted's require exists to block)
    maint.maybeCommit(spark)
    assert(maint.purgeIsPending && LshIndex.tombstoneCount(spark, name) == 1L,
      "purge must not run while a merge is in flight")
    exec.runAll()
    // first post-commit trigger: commit lands, THEN the purge runs —
    // same thread, between merges, exactly the contract
    maint.maybeCommit(spark)
    assert(!maint.purgeIsPending)
    assert(LshIndex.tombstoneCount(spark, name) == 0L)
    spark.catalog.refreshTable(LshIndex.setsTable(name))
    assert(!spark.table(LshIndex.setsTable(name))
      .select("doc_id").as[Long].collect().contains(3L),
      "tombstoned rows must be physically gone after the routed purge")
  }

  test("requestRebucket defers around an in-flight merge, then migrates on the trigger thread") {
    val name = "lshmaint_rb"
    LshIndex.buildGen((0L until 20L).map(doc).toDF("doc_id", "text"), name, 8)
    val exec = deferred
    val maint = new LshMaintenance(spark, name, exec)
    LshIndex.appendHot(Seq(doc(100L)).toDF("doc_id", "text"), name)
    maint.rotateAndStage(spark, hotFractionPm = 0L)
    maint.requestRebucket(16)
    // merge staging: the migration must DEFER (the staged merge
    // slices files under the OLD bucket count)
    maint.maybeCommit(spark)
    assert(maint.rebucketIsPending &&
      graft.sources.Bucketed.bucketCount(spark, LshIndex.setsTable(name)) == 8,
      "rebucket must not run while a merge is in flight")
    exec.runAll()
    // post-commit trigger: commit lands, then the migration runs —
    // same thread, between merges
    maint.maybeCommit(spark)
    assert(!maint.rebucketIsPending)
    Seq(LshIndex.setsTable(name), LshIndex.bandsTable(name),
        LshIndex.hotSetsTable(name), LshIndex.hotBandsTable(name))
      .foreach { t =>
        spark.catalog.refreshTable(t)
        assert(graft.sources.Bucketed.bucketCount(spark, t) == 16,
          s"$t must carry the migrated spec")
      }
    assert(spark.table(LshIndex.setsTable(name)).count() == 21L,
      "migration must not lose rows")
  }

  test("recover re-arms a pending purge from surviving tombstones (restart-durable reclaim)") {
    import spark.implicits._
    val name = "lshmaint_rearm"
    LshIndex.buildGen((0L until 10L).map(doc).toDF("doc_id", "text"), name)
    LshIndex.delete(Seq(3L).toDF("doc_id"), name)
    // restart between requestPurge and the next safe trigger: the
    // volatile flag is gone, but the tombstones ARE the durable request
    val maint = new LshMaintenance(spark, name, deferred)
    maint.recover()
    assert(maint.purgeIsPending,
      "recover must re-arm the purge while tombstones survive")
    maint.maybeCommit(spark)
    assert(!maint.purgeIsPending && LshIndex.tombstoneCount(spark, name) == 0L)
    spark.catalog.refreshTable(LshIndex.setsTable(name))
    assert(!spark.table(LshIndex.setsTable(name))
      .select("doc_id").as[Long].collect().contains(3L))
    // and with nothing tombstoned, recover arms nothing
    val maint2 = new LshMaintenance(spark, name, deferred)
    maint2.recover()
    assert(!maint2.purgeIsPending)
  }

  test("empty-hot guard and commit ordering with an explicit executor") {
    val name = "lshmaint_empty"
    LshIndex.buildGen((0L until 8L).map(doc).toDF("doc_id", "text"), name)
    val exec = deferred
    val maint = new LshMaintenance(spark, name, exec)
    // empty hot: even an ungated cadence hit must not rotate (a quiet
    // stream would otherwise churn no-op merges)
    maint.rotateAndStage(spark, hotFractionPm = 0L)
    assert(!maint.mergeInFlight)
    LshIndex.appendHot(Seq(doc(50L)).toDF("doc_id", "text"), name)
    maint.rotateAndStage(spark, hotFractionPm = 0L)
    assert(maint.mergeInFlight && !maint.stageCompleted)
    // commit before the stage finished: must be a no-op
    maint.maybeCommit(spark)
    assert(maint.mergeInFlight)
    exec.runAll()
    assert(maint.stageCompleted)
    maint.maybeCommit(spark)
    assert(!maint.mergeInFlight &&
      !spark.catalog.tableExists(LshIndex.mergingSetsTable(name)))
    spark.catalog.refreshTable(LshIndex.setsTable(name))
    assert(spark.table(LshIndex.setsTable(name)).count() == 9L)
  }
}
