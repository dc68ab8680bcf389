package graft

/** Registry-wide cache hygiene: after ANY registered query is built
  * and its action completes, no persistent RDD blocks may remain on
  * the context. Two leak classes this pins down (the round-13 hygiene
  * finding):
  *
  *  - `Dataset.persist` entries: the session CacheManager holds a
  *    STRONG reference, so a forgotten unpersist lives for the whole
  *    session — in the shared 234-query bench/verify session those
  *    MEMORY_AND_DISK caches accrete and evict later queries' useful
  *    blocks. Operators whose persists feed the returned lazy plan
  *    release them via [[Caches.releaseAfterNextAction]]; eager
  *    builders (index build/append, graph loops) release in
  *    try/finally.
  *  - `localCheckpoint` blocks: RDD-level, collected by the
  *    ContextCleaner once the frame is unreachable — the drain poll
  *    nudges the GC, so a leak here means a REACHABLE reference is
  *    being held (e.g. a static cache), which this spec would surface.
  *
  * The sweep runs every registry query at sf0.001 with a real action
  * (noop-format write — materializes the full plan including final
  * projections, same action the bench uses), then asserts the drain.
  */
class CacheHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  test("every registry query drains all persistent RDDs after its action") {
    assume(available, "driver testdata not present")
    graft.functions.GraftExtensions.register(spark)
    // start from a clean slate so a leak is attributable to one query.
    // Suite order is randomized and sibling suites may legitimately
    // hold test-local persists when this one starts — force-release
    // them rather than asserting on other suites' internals (the
    // registry contract under test here is per-QUERY hygiene).
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(Caches.awaitDrained(spark),
      s"pre-existing persistent RDDs survived a forced release: " +
        s"${Caches.remainingPersistentRDDs(spark)}")
    val leaks = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      if (!Caches.awaitDrained(spark))
        leaks(name) = Caches.remainingPersistentRDDs(spark)
    }
    assert(leaks.isEmpty, "queries leaking persistent RDDs:\n" +
      leaks.map { case (n, r) => s"  $n -> ${r.mkString("; ")}" }
        .mkString("\n"))
  }
}
