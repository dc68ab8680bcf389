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
