package graft.llm

import graft.SparkSpec

/** Index lifecycle: build persists the IVF halves through the bucketed
  * layout, query serves from disk alone and matches the in-memory
  * operator exactly. */
class AnnIndexSpec extends SparkSpec {

  test("build then query-from-disk matches in-memory ivfTopK exactly") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.build(emb, "annspec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    val fromDisk = rows(AnnIndex.query(spark, "annspec"))
    val inMemory = rows(Similarity.ivfTopK(emb))
    assert(fromDisk.nonEmpty && fromDisk == inMemory,
      "stored index must answer identically to the in-memory operator")
    // multi-probe serves from the same stored layout
    val disk3 = rows(AnnIndex.query(spark, "annspec", nprobe = 3))
    val mem3 = rows(Similarity.ivfTopK(emb, nprobe = 3))
    assert(disk3 == mem3)
    // the cells table really is bucketed on the probe key — the layout
    // IS the point (co-located probe reads, bucket pruning on cent_id)
    val ddl = spark.sql(s"SHOW CREATE TABLE ${AnnIndex.cellsTable("annspec")}")
      .collect().head.getString(0).toLowerCase
    assert(ddl.contains("clustered by") && ddl.contains("cent_id"), ddl)
  }

  test("buildPq then queryPq-from-disk matches in-memory ivfPqTopK exactly") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.buildPq(emb, "annspec_pq")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    assert(rows(AnnIndex.queryPq(spark, "annspec_pq")) ==
      rows(Similarity.ivfPqTopK(emb)))
    assert(rows(AnnIndex.queryPq(spark, "annspec_pq", nprobe = 3)) ==
      rows(Similarity.ivfPqTopK(emb, nprobe = 3)))
    // the compressed table really is the byte-budget shape: 8 code
    // rows per vector, codes within the one-byte codebook range
    val codes = spark.table(AnnIndex.codesTable("annspec_pq"))
    val n = spark.table(AnnIndex.cellsTable("annspec_pq")).count()
    assert(codes.count() == n * Similarity.PqM)
    import org.apache.spark.sql.functions.{col, max, min}
    val mm = codes.select(min(col("code")), max(col("code"))).collect().head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < Similarity.PqK)
  }

  test("delete ≡ build on the surviving corpus; purge keeps answers, drops rows") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    AnnIndex.build(emb, "annspec_del")
    val before = rows(AnnIndex.query(spark, "annspec_del"))
    // victims: stored vectors, never seeds (vec_id < 16) or query
    // sources (vec_id < 5) — ≡ 3 mod 7 above 100 hits some of the
    // current top-k so the delete visibly reshapes results
    val victims = emb.filter(col("vec_id") >= 100 &&
      pmod(col("vec_id"), lit(7)) === 3).select("vec_id")
    val victimSet = victims.collect().map(_.getLong(0)).toSet
    assert(before.exists(r => victimSet(r._2)),
      "fixture needs a deleted vector inside the pre-delete top-k")
    AnnIndex.delete(victims, "annspec_del")
    val after = rows(AnnIndex.query(spark, "annspec_del"))
    assert(!after.exists(r => victimSet(r._2)))
    // the gold contract: delete(X) then query ≡ build(corpus − X) then
    // query — ranks re-close over the survivors, not merely filter
    AnnIndex.build(emb.join(victims, Seq("vec_id"), "left_anti"),
      "annspec_del_ref")
    assert(after === rows(AnnIndex.query(spark, "annspec_del_ref")))
    // idempotent re-delete; unknown ids harmless
    AnnIndex.delete(victims, "annspec_del")
    AnnIndex.delete(Seq(987654321L).toDF("vec_id"), "annspec_del")
    assert(rows(AnnIndex.query(spark, "annspec_del")) === after)
    // purge: physical rewrite, identical answers, rows gone, tombstones cleared
    val cellsBefore = spark.table(AnnIndex.cellsTable("annspec_del")).count()
    AnnIndex.purgeDeleted(spark, "annspec_del")
    assert(rows(AnnIndex.query(spark, "annspec_del")) === after)
    assert(spark.table(AnnIndex.cellsTable("annspec_del")).count()
      === cellsBefore - victimSet.size)
    assert(!spark.catalog.tableExists(
      AnnIndex.tombstonesTable("annspec_del")))
  }

  test("lifecycle interleaving: delete·append·query ≡ build(A∖X ∪ B)·query; purge composes; deletes reach appended rows") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    // seeds (vec_id < 16) live in A, so append keeps centroids fixed
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    val x = a.filter(col("vec_id") >= 100 &&
      pmod(col("vec_id"), lit(7)) === 3).select("vec_id")
    val reference = {
      AnnIndex.build(
        a.join(x, Seq("vec_id"), "left_anti").unionByName(b), "annspec_ilref")
      rows(AnnIndex.query(spark, "annspec_ilref"))
    }
    // 1. delete BEFORE append: tombstones must not suppress the batch
    AnnIndex.build(a, "annspec_il1")
    AnnIndex.delete(x, "annspec_il1")
    AnnIndex.append(b, "annspec_il1")
    assert(rows(AnnIndex.query(spark, "annspec_il1")) == reference)
    // 2. purge between delete and append: physical rewrite composes
    AnnIndex.build(a, "annspec_il2")
    AnnIndex.delete(x, "annspec_il2")
    AnnIndex.purgeDeleted(spark, "annspec_il2")
    AnnIndex.append(b, "annspec_il2")
    assert(rows(AnnIndex.query(spark, "annspec_il2")) == reference)
    // 3. delete AFTER append reaches the APPENDED rows
    val y = b.filter(pmod(col("vec_id"), lit(7)) === 2).select("vec_id")
    val ySet = y.collect().map(_.getLong(0)).toSet
    assert(reference.exists(r => ySet(r._2)),
      "fixture needs an appended vector inside the top-k")
    AnnIndex.delete(y, "annspec_il1")
    val afterY = rows(AnnIndex.query(spark, "annspec_il1"))
    assert(!afterY.exists(r => ySet(r._2)))
    AnnIndex.build(a.join(x, Seq("vec_id"), "left_anti")
      .unionByName(b.join(y, Seq("vec_id"), "left_anti")), "annspec_ilref2")
    assert(afterY == rows(AnnIndex.query(spark, "annspec_ilref2")))
    // purge-debt observability: cellStats surfaces pending tombstones,
    // purge zeroes them and keeps answers
    assert(AnnIndex.cellStats(spark, "annspec_il1")
      .select("n_tombstones").distinct().head().getLong(0) ==
      AnnIndex.tombstoneCount(spark, "annspec_il1"))
    assert(AnnIndex.tombstoneCount(spark, "annspec_il1") > 0L)
    AnnIndex.purgeDeleted(spark, "annspec_il1")
    assert(AnnIndex.tombstoneCount(spark, "annspec_il1") == 0L)
    assert(rows(AnnIndex.query(spark, "annspec_il1")) == afterY)
  }

  test("incremental append equals a full rebuild when seeds live in the first batch") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    // seeds are vec_id < 16, well inside the first batch — so stored
    // centroids/codebook are identical to a full build's, and per-
    // vector assignment/encoding is batch-independent
    val first = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    AnnIndex.buildPq(first, "annspec_inc")
    AnnIndex.appendPq(rest, "annspec_inc")
    AnnIndex.buildPq(emb, "annspec_full")
    assert(rows(AnnIndex.query(spark, "annspec_inc")) ==
      rows(AnnIndex.query(spark, "annspec_full")))
    assert(rows(AnnIndex.queryPq(spark, "annspec_inc", nprobe = 3)) ==
      rows(AnnIndex.queryPq(spark, "annspec_full", nprobe = 3)))
    // and both equal the in-memory operators over the union corpus
    assert(rows(AnnIndex.query(spark, "annspec_inc")) ==
      rows(Similarity.ivfTopK(emb)))
    assert(rows(AnnIndex.queryPq(spark, "annspec_inc")) ==
      rows(Similarity.ivfPqTopK(emb)))
    // appended rows really landed in the bucketed tables
    assert(spark.table(AnnIndex.cellsTable("annspec_inc")).count() == emb.count())
    assert(spark.table(AnnIndex.codesTable("annspec_inc")).count() ==
      emb.count() * Similarity.PqM)
  }

  test("buildPqRes then queryPqRes-from-disk matches in-memory ivfPqResTopK exactly") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.buildPqRes(emb, "annspec_res")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    val disk1 = rows(AnnIndex.queryPqRes(spark, "annspec_res"))
    assert(disk1.nonEmpty && disk1 == rows(Similarity.ivfPqResTopK(emb)))
    // residual + multi-probe serves from the same stored layout
    assert(rows(AnnIndex.queryPqRes(spark, "annspec_res", nprobe = 3)) ==
      rows(Similarity.ivfPqResTopK(emb, nprobe = 3)))
    // byte-budget shape: 8 residual-code rows per vector, codes in range
    val codes = spark.table(AnnIndex.resCodesTable("annspec_res"))
    val n = spark.table(AnnIndex.cellsTable("annspec_res")).count()
    assert(codes.count() == n * Similarity.PqM)
    import org.apache.spark.sql.functions.{col, max, min}
    val mm = codes.select(min(col("code")), max(col("code"))).collect().head
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < Similarity.PqK)
  }

  test("appendPqRes equals a full residual rebuild when all seeds live in the first batch") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    // centroid seeds (vec_id < 16) AND residual-codebook seeds
    // (vec_id in [16, 32)) are inside the first batch, so the stored
    // parameter tables equal a full build's and per-vector
    // assignment/encoding is batch-independent
    val first = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    AnnIndex.buildPqRes(first, "annspec_rinc")
    AnnIndex.appendPqRes(rest, "annspec_rinc")
    AnnIndex.buildPqRes(emb, "annspec_rfull")
    assert(rows(AnnIndex.queryPqRes(spark, "annspec_rinc")) ==
      rows(AnnIndex.queryPqRes(spark, "annspec_rfull")))
    assert(rows(AnnIndex.queryPqRes(spark, "annspec_rinc", nprobe = 3)) ==
      rows(Similarity.ivfPqResTopK(emb, nprobe = 3)))
    assert(spark.table(AnnIndex.resCodesTable("annspec_rinc")).count() ==
      emb.count() * Similarity.PqM)
  }

  test("cellStats from the stored index equals the in-memory maintenance signal") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.build(emb, "annspec_stats")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("cent_id"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("share_pm"), r.getAs[Long]("skew_pm"))).toSet
    assert(rows(AnnIndex.cellStats(spark, "annspec_stats")) ==
      rows(Similarity.cellStats(emb)))
    // the skew scale must come from the STORED centroid count, not a
    // default: on an 8-cell index skew_pm is share × 8, and a wrong
    // 16-cell scale would double every value and mask hot cells
    AnnIndex.build(emb, "annspec_stats8", nCentroids = 8)
    assert(rows(AnnIndex.cellStats(spark, "annspec_stats8")) ==
      rows(Similarity.cellStats(emb, nCentroids = 8)))
    val skews = AnnIndex.cellStats(spark, "annspec_stats8").collect()
      .map(r => (r.getAs[Long]("share_pm"), r.getAs[Long]("skew_pm")))
    skews.foreach { case (share, skew) =>
      assert(skew >= share * 8 - 8 && skew <= share * 8 + 8,
        s"skew_pm $skew inconsistent with share_pm $share at 8 cells")
    }
  }

  test("a refined index persists refined centroids, and rebuild overwrites cleanly") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.build(emb, "annspec_km", refineIters = 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(rows(AnnIndex.query(spark, "annspec_km")) ==
      rows(Similarity.ivfTopK(emb, refineIters = 1)))
    // rebuilding with different parameters overwrites in place
    AnnIndex.build(emb, "annspec_km", refineIters = 0)
    assert(rows(AnnIndex.query(spark, "annspec_km")) ==
      rows(Similarity.ivfTopK(emb)))
  }

  test("compact: appends fragment the appendable tables, compact restores one file per bucket, answers unchanged") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    AnnIndex.buildPq(emb.filter(col("vec_id") < 200), "annspec_cpt")
    // a run of micro-appends — the ingest-loop fragmentation pattern
    for (lo <- 200L to 440L by 60L)
      AnnIndex.appendPq(
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 60), "annspec_cpt")
    val cellsT = AnnIndex.cellsTable("annspec_cpt")
    val codesT = AnnIndex.codesTable("annspec_cpt")
    def frag(t: String) = graft.sources.Bucketed.fileStats(spark, t)
    val (cellFilesBefore, cellRows) = frag(cellsT)
    val (codeFilesBefore, codeRows) = frag(codesT)
    val before = rows(AnnIndex.query(spark, "annspec_cpt", nprobe = 3))
    val beforePq = rows(AnnIndex.queryPq(spark, "annspec_cpt", nprobe = 3))

    AnnIndex.compact(spark, "annspec_cpt")

    // one file per non-empty bucket: bucket id = pmod(murmur3(key), n),
    // exactly functions.hash — expected file count from the rows themselves
    def nonEmpty(t: String) = spark.table(t)
      .select(countDistinct(pmod(hash(col("cent_id")),
        lit(graft.sources.Bucketed.bucketCount(spark, t)))))
      .collect().head.getLong(0)
    val (cellFilesAfter, cellRowsAfter) = frag(cellsT)
    val (codeFilesAfter, codeRowsAfter) = frag(codesT)
    assert(cellFilesBefore > cellFilesAfter && codeFilesBefore > codeFilesAfter,
      s"appends must fragment: cells $cellFilesBefore→$cellFilesAfter, " +
        s"codes $codeFilesBefore→$codeFilesAfter")
    assert(cellFilesAfter == nonEmpty(cellsT), s"cells: $cellFilesAfter files")
    assert(codeFilesAfter == nonEmpty(codesT), s"codes: $codeFilesAfter files")
    assert(cellRowsAfter == cellRows && codeRowsAfter == codeRows,
      "compact must not lose or invent rows")
    // …and both query paths answer identically through the rewrite
    assert(rows(AnnIndex.query(spark, "annspec_cpt", nprobe = 3)) == before)
    assert(rows(AnnIndex.queryPq(spark, "annspec_cpt", nprobe = 3)) == beforePq)
  }

  test("bulk-probe fallback: identical top-k, shuffle plan above the threshold") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    AnnIndex.buildPq(emb, "annspec_fb")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    def joins(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // threshold 0 forces the bulk path: results identical, and with
    // auto-broadcast off (so plans reflect HINTS only — at spec scale
    // the stats-based planner would broadcast these tiny tables
    // regardless, which is exactly what the bulk path must not rely
    // on) the probe side joins via shuffle
    val autoBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smallQ = AnnIndex.query(spark, "annspec_fb", nprobe = 3)
      val bulkQ = AnnIndex.query(spark, "annspec_fb", nprobe = 3,
        maxBroadcastQueries = 0L)
      assert(rows(bulkQ) == rows(smallQ) && rows(bulkQ).nonEmpty)
      assert(joins(smallQ).contains("BroadcastHashJoin"))
      assert(!joins(bulkQ).contains("BroadcastHashJoin"),
        "bulk path must not broadcast the probe side")
      assert(joins(bulkQ).contains("SortMergeJoin") ||
        joins(bulkQ).contains("ShuffledHashJoin"),
        "bulk path must plan a shuffle join for the probe side")
      val smallPq = AnnIndex.queryPq(spark, "annspec_fb", nprobe = 3)
      val bulkPq = AnnIndex.queryPq(spark, "annspec_fb", nprobe = 3,
        maxBroadcastQueries = 0L)
      assert(rows(bulkPq) == rows(smallPq) && rows(bulkPq).nonEmpty)
      assert(joins(bulkPq).contains("SortMergeJoin") ||
        joins(bulkPq).contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBc)
  }

  test("recluster ≡ rebuild: build(A,0)·append(B)·recluster(r) ≡ build(A∪B,r); subsumes purge") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    // plain IVF: stored centroids after build(A, refineIters = 0) ARE
    // the seed vectors, so warm-start Lloyd = Lloyd from seeds and the
    // exact-rebuild equivalence holds
    AnnIndex.build(a, "annspec_rc")
    AnnIndex.append(b, "annspec_rc")
    AnnIndex.recluster(spark, "annspec_rc", refineIters = 1)
    AnnIndex.build(emb, "annspec_rcref", refineIters = 1)
    assert(rows(AnnIndex.query(spark, "annspec_rc")) ==
      rows(AnnIndex.query(spark, "annspec_rcref")))
    assert(rows(AnnIndex.query(spark, "annspec_rc", nprobe = 3)) ==
      rows(AnnIndex.query(spark, "annspec_rcref", nprobe = 3)))
    // recluster actually moved centroids (a no-op rebalance would mean
    // the fixture tests nothing)
    AnnIndex.build(emb, "annspec_rc0") // refineIters = 0 ⇒ centroids = seeds
    def cents(name: String) =
      spark.table(AnnIndex.centroidsTable(name)).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(cents("annspec_rc") != cents("annspec_rc0"),
      "the Lloyd round did not move any centroid")
    // with a pending delete: Lloyd trains on live rows only, the
    // rewrite keeps only live rows, and tombstones drop (purge subsumed)
    val x = emb.filter(col("vec_id") >= 100 &&
      pmod(col("vec_id"), lit(7)) === 3).select("vec_id")
    AnnIndex.build(a, "annspec_rcd")
    AnnIndex.append(b, "annspec_rcd")
    AnnIndex.delete(x, "annspec_rcd")
    AnnIndex.recluster(spark, "annspec_rcd", refineIters = 1)
    AnnIndex.build(emb.join(x, Seq("vec_id"), "left_anti"),
      "annspec_rcdref", refineIters = 1)
    assert(rows(AnnIndex.query(spark, "annspec_rcd")) ==
      rows(AnnIndex.query(spark, "annspec_rcdref")))
    assert(AnnIndex.tombstoneCount(spark, "annspec_rcd") == 0L)
    assert(spark.table(AnnIndex.cellsTable("annspec_rcd")).count() ==
      emb.count() - x.count())
    // PQ index: codes retag to the new cells (global codebook — codes
    // never invalidated), and the retagged index answers exactly like
    // a rebuild whose cells were Lloyd-refined the same r rounds
    AnnIndex.buildPq(a, "annspec_rcpq")
    AnnIndex.appendPq(b, "annspec_rcpq")
    AnnIndex.recluster(spark, "annspec_rcpq", refineIters = 1)
    AnnIndex.buildPq(emb, "annspec_rcpqref", cellRefineIters = 1)
    assert(rows(AnnIndex.queryPq(spark, "annspec_rcpq")) ==
      rows(AnnIndex.queryPq(spark, "annspec_rcpqref")))
    val cellsTags = spark.table(AnnIndex.cellsTable("annspec_rcpq"))
      .select("vec_id", "cent_id").distinct()
    val codeTags = spark.table(AnnIndex.codesTable("annspec_rcpq"))
      .select("vec_id", "cent_id").distinct()
    assert(cellsTags.join(codeTags, Seq("vec_id", "cent_id")).count() ==
      cellsTags.count(), "codes and cells disagree on a cell after recluster")
    // residual index: centroid moves invalidate residual codes — the
    // only correct maintenance is a rebuild, and recluster says so
    AnnIndex.buildPqRes(a, "annspec_rcres")
    val err = intercept[IllegalArgumentException](
      AnnIndex.recluster(spark, "annspec_rcres"))
    assert(err.getMessage.contains("residual"))
  }

  test("rebucket 8→32 mid-lifecycle: identical answers with tombstones live; appends and purge inherit the new spec") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    AnnIndex.buildPq(first, "annspec_rb", buckets = 8)
    val victims = emb.filter(col("vec_id") >= 100 &&
      pmod(col("vec_id"), lit(7)) === 3).select("vec_id")
    AnnIndex.delete(victims, "annspec_rb")
    val before = rows(AnnIndex.queryPq(spark, "annspec_rb"))
    AnnIndex.rebucket(spark, "annspec_rb", 32)
    for (t <- Seq(AnnIndex.cellsTable("annspec_rb"),
        AnnIndex.codesTable("annspec_rb"))) {
      spark.catalog.refreshTable(t)
      assert(graft.sources.Bucketed.bucketCount(spark, t) == 32,
        s"$t must carry the migrated spec")
    }
    // pure layout: answers identical, tombstones survive verbatim
    assert(rows(AnnIndex.queryPq(spark, "annspec_rb")) == before)
    assert(spark.catalog.tableExists(
      AnnIndex.tombstonesTable("annspec_rb")))
    // the migrated index still runs its lifecycle: appends land under
    // the stored (new) spec, purge rewrites at the new parallelism
    AnnIndex.appendPq(rest, "annspec_rb")
    AnnIndex.buildPq(emb, "annspec_rb_ref", buckets = 8)
    AnnIndex.delete(victims, "annspec_rb_ref")
    val full = rows(AnnIndex.queryPq(spark, "annspec_rb"))
    assert(full == rows(AnnIndex.queryPq(spark, "annspec_rb_ref")),
      "append-after-rebucket must equal the never-rebucketed reference")
    AnnIndex.purgeDeleted(spark, "annspec_rb")
    assert(rows(AnnIndex.queryPq(spark, "annspec_rb")) == full)
    assert(graft.sources.Bucketed.bucketCount(spark,
      AnnIndex.cellsTable("annspec_rb")) == 32,
      "purge's rewrite must preserve the migrated spec")
  }
}
