package graft.ops

import graft.SparkSpec

/** Relational analytics beyond the per-query oracles: the GROUPING
  * SETS lattice must tie out internally (detail → subtotal → grand
  * total), which the flat hash compare can't express. */
class RelationalSpec extends SparkSpec {

  test("revenueRollup: subtotals and grand total tie out exactly") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val rows = Relational.revenueRollup(spark, "/root/testdata/sf0.001")
      .collect()
    val detail = rows.filter(_.getAs[Long]("lvl") == 0L)
    val sub = rows.filter(_.getAs[Long]("lvl") == 1L)
    val grand = rows.filter(_.getAs[Long]("lvl") == 3L)
    assert(detail.nonEmpty && sub.nonEmpty && grand.length == 1)
    assert(rows.length == detail.length + sub.length + 1)
    val g = grand.head
    assert(g.isNullAt(g.fieldIndex("r_name")) &&
      g.isNullAt(g.fieldIndex("n_name")))
    // revenue is integer cents under the hood, so every level of the
    // lattice agrees EXACTLY, not within epsilon
    def cents(r: org.apache.spark.sql.Row): Long =
      math.round(r.getAs[Double]("revenue") * 100)
    assert(detail.map(cents).sum == cents(g))
    assert(detail.map(_.getAs[Long]("n_orders")).sum == g.getAs[Long]("n_orders"))
    sub.foreach { s =>
      assert(s.isNullAt(s.fieldIndex("n_name")))
      val rn = s.getAs[String]("r_name")
      val det = detail.filter(_.getAs[String]("r_name") == rn)
      assert(det.map(cents).sum == cents(s), s"region $rn revenue")
      assert(det.map(_.getAs[Long]("n_orders")).sum ==
        s.getAs[Long]("n_orders"), s"region $rn orders")
    }
  }

  test("nationVolume: both directions only, pair nations only, year bounds") {
    assume(new java.io.File("/root/testdata/sf0.01").isDirectory,
      "driver testdata not present")
    val rows = Relational.nationVolume(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    val pair = Set("NATION_9", "NATION_10")
    rows.foreach { r =>
      val s = r.getAs[String]("supp_nation")
      val c = r.getAs[String]("cust_nation")
      assert(pair(s) && pair(c) && s != c)
      val y = r.getAs[Long]("l_year")
      assert(y == 1995L || y == 1996L)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    // at most 2 directions x 2 years
    assert(rows.length <= 4)
  }

  test("integrityEdge counts orphans; driver schema audits all-clean") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L))
      .toDF("id", "fk")
    val parent = Seq((10L, "a"), (11L, "b")).toDF("pk", "x")
    val r = Relational.integrityEdge("child.fk->parent",
      child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 4L && r.getAs[Long]("n_orphans") == 2L)

    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val report = Relational.integrityReport(spark, "/root/testdata/sf0.001")
      .collect()
    assert(report.length == 6)
    report.foreach { e =>
      assert(e.getAs[Long]("n_rows") > 0L, e.getAs[String]("fk_edge"))
      assert(e.getAs[Long]("n_orphans") == 0L, e.getAs[String]("fk_edge"))
    }
  }

  test("soleReturnSuppliers: agg rewrite ≡ correlated EXISTS/NOT-EXISTS") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val got = Relational.soleReturnSuppliers(spark, dir, k = 1000)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("numwait")))
      .sortBy(identity)
    // reference form: literal correlated subqueries via Spark SQL
    graft.Tables.lineitem(spark, dir).createOrReplaceTempView("li_q21")
    graft.Tables.supplier(spark, dir).createOrReplaceTempView("sup_q21")
    val ref = spark.sql(
      """WITH rs AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
        |  FROM li_q21 GROUP BY l_orderkey, l_suppkey)
        |SELECT s_suppkey, count(*) AS numwait
        |FROM rs r1 JOIN sup_q21 ON r1.l_suppkey = s_suppkey
        |WHERE r1.ret = 1
        |  AND EXISTS (SELECT 1 FROM rs r2
        |    WHERE r2.l_orderkey = r1.l_orderkey
        |      AND r2.l_suppkey <> r1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM rs r3
        |    WHERE r3.l_orderkey = r1.l_orderkey
        |      AND r3.l_suppkey <> r1.l_suppkey AND r3.ret = 1)
        |GROUP BY s_suppkey""".stripMargin)
      .collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("numwait")))
      .sortBy(identity)
    assert(got.nonEmpty && got.toSeq == ref.toSeq)
  }

  test("nameClusters labels each JW component with its min partkey") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val pairs = Relational.jaroWinklerPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")))
    assume(pairs.nonEmpty, "no JW pairs at this SF")
    // driver-side union-find reference over the same pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ref = parent.keys.map(k => k -> find(k)).toMap
    val got = Relational.nameClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("canonical_key"))
      .toMap
    assert(got == ref)
    // transitivity did real work if any component has > 2 nodes
    assert(got.values.toSeq.distinct.size < got.size)
  }

  test("sortedNeighborhoodPairs ≡ naive global-sort window (exactness)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val w = 8
    // naive single-node reference: collect, sort by (name, key), compare
    // each record to its w-1 successors — the definitionally-correct SNM
    val parts = graft.Tables.part(spark, dir)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (k, n) => (n, k) }
    val want = (for {
      i <- parts.indices
      j <- (i + 1) until math.min(i + w, parts.length)
      jw = graft.functions.JaroWinklerOps
        .jaroWinkler(parts(i)._2, parts(j)._2)
      jwr = math.round(jw * 10000) / 10000.0 if jwr >= 0.9
    } yield (parts(i)._1, parts(j)._1, jwr, (j - i).toLong)).toSet
    val got = Relational.sortedNeighborhoodPairs(spark, dir, w).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Double]("jw"), r.getAs[Long]("dist"))).toSet
    assert(got === want)
    assert(got.nonEmpty, "window should catch at least one near-dup name")
  }

  test("blockingComparison: group counts tie out against the pair sets") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val snm = Relational.sortedNeighborhoodPairs(spark, dir).collect()
      .map(r => (math.min(r.getAs[Long]("key_a"), r.getAs[Long]("key_b")),
        math.max(r.getAs[Long]("key_a"), r.getAs[Long]("key_b")))).toSet
    val blk = Relational.jaroWinklerPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"))).toSet
    val rows = Relational.blockingComparison(spark, dir).collect()
      .map(r => ((r.getAs[Int]("in_sorted_neighborhood"),
        r.getAs[Int]("in_key_blocking")), r.getAs[Long]("n_pairs"))).toMap
    assert(rows.getOrElse((1, 1), 0L) === (snm & blk).size.toLong)
    assert(rows.getOrElse((1, 0), 0L) === (snm -- blk).size.toLong)
    assert(rows.getOrElse((0, 1), 0L) === (blk -- snm).size.toLong)
    assert(!rows.contains((0, 0)))
  }

  test("sortedNeighborhoodMultipass: provenance flags tie out; both passes contribute") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val fwd = Relational.sortedNeighborhoodPairs(spark, dir).collect()
      .map(r => (math.min(r.getAs[Long]("key_a"), r.getAs[Long]("key_b")),
        math.max(r.getAs[Long]("key_a"), r.getAs[Long]("key_b")))).toSet
    val rows = Relational.sortedNeighborhoodMultipass(spark, dir).collect()
      .map(r => ((r.getAs[Long]("key_a"), r.getAs[Long]("key_b")),
        (r.getAs[Int]("in_fwd"), r.getAs[Int]("in_rev"))))
    // one row per canonical pair, keys ordered
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case ((a, b), _) => assert(a < b) }
    val byPair = rows.toMap
    // in_fwd rows are exactly the single-pass pairs
    assert(byPair.filter(_._2._1 == 1).keySet === fwd)
    // never an all-zero row, and the reverse ordering finds pairs the
    // forward pass structurally missed (the multi-pass raison d'être)
    assert(byPair.values.forall(v => v._1 == 1 || v._2 == 1))
    assert(byPair.values.exists(v => v._1 == 0 && v._2 == 1),
      "reverse pass found nothing new — multipass adds no recall here")
  }

  test("customerOrderDistribution keeps the zero-order bucket") {
    import spark.implicits._
    // 3 customers: one with 2 orders, one with 1, one with none
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val got = Relational.customerOrderDistributionOf(cust, ord)
      .collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist"))
      .toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
