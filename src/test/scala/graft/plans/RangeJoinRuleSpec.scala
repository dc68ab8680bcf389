package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The naive-inequality-join rewrite: same rows as the nested loop,
  * equi-join physical plan. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    graft.functions.GraftExtensions.register(spark)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRule)
  }

  private def joinNodes(df: DataFrame): Seq[String] = {
    df.collect()
    planNodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName).filter(_.contains("Join"))
  }

  /** The rewrite fired: the bucketed branch plans as an EQUI join.
    * (A BroadcastNestedLoopJoin may legitimately coexist — it is the
    * span-guarded sentinel fallback branch, empty for bounded
    * intervals; `sentinelFallback=false` removes it.) */
  private def assertBucketed(df: DataFrame): Unit = {
    val nodes = joinNodes(df)
    assert(nodes.exists(n => n.contains("HashJoin") || n.contains("SortMergeJoin")),
      s"no equi-join branch in $nodes")
  }

  private def pts = (0L until 300L).map(p => (p, s"p$p")).toDF("p", "tag")
  private def ivs = (0L until 60L).map(i => (i, i * 4, i * 4 + 13))
    .toDF("iv_id", "s", "e")

  private def brute: Set[(Long, Long)] = (for {
    p <- 0L until 300L
    (id, s, e) <- (0L until 60L).map(i => (i, i * 4, i * 4 + 13))
    if p >= s && p < e
  } yield (id, p)).toSet

  test("naive range join is rewritten to an equi-join with identical rows") {
    withRule {
      val df = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
      assertBucketed(df)
      val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
      assert(got == brute)
    }
  }

  test("points side on the right rewrites too; schema order is preserved") {
    withRule {
      val df = ivs.join(pts, $"p" >= $"s" && $"p" < $"e")
      assert(df.columns.toSeq == Seq("iv_id", "s", "e", "p", "tag"))
      assertBucketed(df)
      assert(df.select("iv_id", "p").as[(Long, Long)].collect().toSet == brute)
    }
  }

  test("operand order variants and empty/null intervals are exact") {
    withRule {
      val weird = Seq(
        (1L, 5L, 9L),                              // normal
        (2L, 7L, 7L),                              // empty
        (3L, 290L, 1000L),                         // runs past domain
        (4L, -8L, 3L)                              // negative start
      ).toDF("iv_id", "s", "e")
      // s <= p && e > p spelling
      val df = pts.join(weird, $"s" <= $"p" && $"e" > $"p")
      assertBucketed(df)
      val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
      val want = (for {
        p <- 0L until 300L
        (id, s, e) <- Seq((1L, 5L, 9L), (2L, 7L, 7L), (3L, 290L, 1000L), (4L, -8L, 3L))
        if p >= s && p < e
      } yield (id, p)).toSet
      assert(got == want)
    }
  }

  test("all four bound-openness variants rewrite and match the nested loop exactly") {
    val ivRows = Seq(
      (1L, 5L, 9L), (2L, 7L, 7L), (3L, 290L, 1000L), (4L, -8L, 3L),
      (5L, 40L, 41L)) // adjacent bounds: (s,e) open-open is empty
    val weird = ivRows.toDF("iv_id", "s", "e")
    val variants: Seq[(String, org.apache.spark.sql.Column, (Long, Long, Long) => Boolean)] = Seq(
      ("closed-open", $"p" >= $"s" && $"p" < $"e", (p, s, e) => p >= s && p < e),
      ("closed-closed", $"p" >= $"s" && $"p" <= $"e", (p, s, e) => p >= s && p <= e),
      ("open-open", $"p" > $"s" && $"p" < $"e", (p, s, e) => p > s && p < e),
      ("open-closed", $"p" > $"s" && $"p" <= $"e", (p, s, e) => p > s && p <= e),
      // chain spelling: s < p AND p <= e reads as an interval test too
      ("chain", $"s" < $"p" && $"p" <= $"e", (p, s, e) => p > s && p <= e))
    withRule {
      for ((name, cond, pred) <- variants) {
        val df = pts.join(weird, cond)
        assertBucketed(df)
        val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
        val want = (for {
          p <- 0L until 300L
          (id, s, e) <- ivRows if pred(p, s, e)
        } yield (id, p)).toSet
        assert(got == want, s"$name rows diverged")
      }
    }
  }

  test("Long.MIN/MAX sentinel bounds neither crash nor mismatch the nested loop") {
    // bucket bounds use the RAW s/e with no ±1 arithmetic: a sentinel
    // bound must not overflow (ANSI ArithmeticException) or explode
    // the generated bucket sequence — it either filters out (e < s)
    // or is handled by the residual predicate
    val ivRows = Seq(
      (1L, 5L, 9L),                       // normal
      (2L, Long.MaxValue, Long.MinValue), // descending sentinels: empty
      (3L, 250L, 260L))
    val weird = ivRows.toDF("iv_id", "s", "e")
    withRule {
      for ((name, cond, pred) <- Seq[(String, org.apache.spark.sql.Column,
          (Long, Long, Long) => Boolean)](
        ("closed-open", $"p" >= $"s" && $"p" < $"e", (p, s, e) => p >= s && p < e),
        ("open-closed", $"p" > $"s" && $"p" <= $"e", (p, s, e) => p > s && p <= e))) {
        val df = pts.join(weird, cond)
        assertBucketed(df)
        val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
        val want = (for {
          p <- 0L until 300L
          (id, s, e) <- ivRows if pred(p, s, e)
        } yield (id, p)).toSet
        assert(got == want, s"$name diverged on sentinel bounds")
      }
    }
  }

  test("Column.between rewrites through the closed-closed matcher") {
    // the API users actually reach for: between desugars to
    // (p >= s) AND (p <= e), exactly the closed-closed conjunct pair
    withRule {
      val df = pts.join(ivs, $"p".between($"s", $"e"))
      assertBucketed(df)
      val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
      val want = (for {
        p <- 0L until 300L
        (id, s, e) <- (0L until 60L).map(i => (i, i * 4, i * 4 + 13))
        if p >= s && p <= e
      } yield (id, p)).toSet
      assert(got == want)
    }
  }

  test("IntegerType columns rewrite through an exact widening cast") {
    val ptsI = (0 until 300).map(p => (p, s"p$p")).toDF("p", "tag")
    val ivsI = (0 until 60).map(i => (i, i * 4, i * 4 + 13)).toDF("iv_id", "s", "e")
    withRule {
      val df = ptsI.join(ivsI, $"p" >= $"s" && $"p" < $"e")
      assertBucketed(df)
      val got = df.select("iv_id", "p").as[(Int, Int)].collect().toSet
      val want = (for {
        p <- 0 until 300
        (id, s, e) <- (0 until 60).map(i => (i, i * 4, i * 4 + 13))
        if p >= s && p < e
      } yield (id, p)).toSet
      assert(got == want)
      // mixed int point / long bounds widens too
      val mixed = ptsI.join(ivs, $"p" >= $"s" && $"p" < $"e")
      assertBucketed(mixed)
      assert(mixed.select("iv_id", "p").as[(Long, Int)].collect().toSet ==
        brute.map { case (id, p) => (id, p.toInt) })
    }
  }

  test("non-matching shapes keep Spark's default plan") {
    withRule {
      // single inequality: not a point-in-interval test — untouched
      val df = pts.join(ivs, $"p" >= $"s")
      assert(joinNodes(df).exists(n =>
        n.contains("BroadcastNestedLoopJoin") || n.contains("CartesianProduct")))
      // equi-join: untouched (already scalable)
      val eq = pts.join(ivs, $"p" === $"s")
      assert(joinNodes(eq).exists(n => !n.contains("NestedLoop")))
    }
  }

  test("differential fuzz vs the nested loop: random intervals, negatives and nulls") {
    val rnd = new scala.util.Random(20260812L)
    val ptRows = (0 until 400).map { i =>
      (i.toLong, if (rnd.nextInt(20) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong() % 200L))
    }
    val ivRows = (0 until 80).map { i =>
      val s = rnd.nextLong() % 150L
      val len = rnd.nextInt(40).toLong - 5L // some empty/negative-length
      (i.toLong,
        if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(s),
        if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(s + len))
    }
    val pts = ptRows.toDF("pid", "p")
    val ivs = ivRows.toDF("iv_id", "s", "e")
    val want = (for {
      (pid, p) <- ptRows if p != null
      (id, s, e) <- ivRows if s != null && e != null
      if p >= s && p < e
    } yield (id, pid)).toSet
    withRule {
      val df = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
      assertBucketed(df)
      val got = df.select("iv_id", "pid").as[(Long, Long)].collect().toSet
      assert(got == want)
    }
    // control: identical rows from Spark's own nested loop, rule off
    val ctl = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
      .select("iv_id", "pid").as[(Long, Long)].collect().toSet
    assert(ctl == want)
  }

  test("rule result matches the library operator") {
    withRule {
      val viaRule = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      val viaLib = graft.ops.Ranges.pointInIntervalJoin(pts, "p", ivs, "s", "e")
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      assert(viaRule == viaLib)
    }
  }

  test("ASCENDING sentinel/unbounded intervals route through the span-guard fallback") {
    // s = Long.MIN / e = Long.MAX as "no bound": bucket replication
    // would need ~2^60 generated rows per interval — the one shape the
    // equi rewrite cannot absorb. The span guard sends exactly these
    // rows to a nested-loop branch on the original predicate; bounded
    // rows still take the bucketed join, and the union is exact.
    val ivRows = Seq(
      (1L, 5L, 9L),                  // bounded: bucketed branch
      (2L, 100L, Long.MaxValue),     // unbounded above: fallback
      (3L, Long.MinValue, 10L),      // unbounded below: fallback
      (4L, Long.MinValue, Long.MaxValue), // matches every point: fallback
      (5L, 250L, 260L))              // bounded: bucketed branch
    val weird = ivRows.toDF("iv_id", "s", "e")
    withRule {
      val df = pts.join(weird, $"p" >= $"s" && $"p" < $"e")
      val nodes = joinNodes(df)
      assertBucketed(df)
      assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")),
        s"sentinel rows need the fallback branch; plan had $nodes")
      val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
      val want = (for {
        p <- 0L until 300L
        (id, s, e) <- ivRows if p >= s && p < e
      } yield (id, p)).toSet
      assert(got == want, "sentinel intervals diverged from the nested-loop rows")
    }
  }

  test("non-power-of-two width: sentinel bounds near Long.MinValue stay exact (no overflow)") {
    // ADVICE r6: the old bucketOf — (x − pmod(x, w)) div w — wrapped for
    // x within w of Long.MinValue under a non-power-of-two width
    // (pmod > 0 pushes the subtract past the representable range), so
    // the span guard saw a huge-NEGATIVE span, classified the unbounded
    // interval as small, and the bucketed branch's Sequence blew up at
    // runtime. Powers of two dodge it (pmod(Long.MinValue, 2^k) = 0),
    // which is why the width-16 default never tripped. Pin widths 10
    // and 7 against the nested loop, including bounds AT and NEAR
    // Long.MinValue on both ends.
    val ivRows = Seq(
      (1L, 5L, 9L),                            // bounded: bucketed branch
      (2L, Long.MinValue, 10L),                // unbounded below: fallback
      (3L, Long.MinValue + 3L, 20L),           // within w of MinValue: fallback
      (4L, Long.MinValue, Long.MaxValue),      // fully unbounded: fallback
      (5L, Long.MaxValue, Long.MinValue),      // descending sentinels: empty
      (6L, 250L, 260L))                        // bounded: bucketed branch
    val weird = ivRows.toDF("iv_id", "s", "e")
    val want = (for {
      p <- 0L until 300L
      (id, s, e) <- ivRows if p >= s && p < e
    } yield (id, p)).toSet
    withRule {
      for (w <- Seq("10", "7")) {
        spark.conf.set(RangeJoinRule.WidthKey, w)
        try {
          val df = pts.join(weird, $"p" >= $"s" && $"p" < $"e")
          assertBucketed(df)
          val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
          assert(got == want, s"width $w diverged on MinValue-adjacent sentinels")
        } finally spark.conf.unset(RangeJoinRule.WidthKey)
      }
    }
  }

  test("sentinelFallback=false restores the single-branch plan for bounded intervals") {
    withRule {
      spark.conf.set(RangeJoinRule.FallbackKey, "false")
      try {
        val df = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
        val nodes = joinNodes(df)
        assert(!nodes.exists(_.contains("BroadcastNestedLoopJoin")), nodes)
        assert(df.select("iv_id", "p").as[(Long, Long)].collect().toSet == brute)
      } finally spark.conf.unset(RangeJoinRule.FallbackKey)
    }
  }

  test("span cap is honored: a wide-but-finite interval beyond the cap uses the fallback") {
    withRule {
      spark.conf.set(RangeJoinRule.MaxSpanKey, "4")
      try {
        // width 16 × cap 4 ⇒ spans beyond ~64 domain units fall back
        val weird = Seq((1L, 5L, 9L), (2L, 0L, 10000L)).toDF("iv_id", "s", "e")
        val df = pts.join(weird, $"p" >= $"s" && $"p" < $"e")
        val nodes = joinNodes(df)
        assertBucketed(df)
        assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")), nodes)
        val got = df.select("iv_id", "p").as[(Long, Long)].collect().toSet
        val want = (for {
          p <- 0L until 300L
          (id, s, e) <- Seq((1L, 5L, 9L), (2L, 0L, 10000L)) if p >= s && p < e
        } yield (id, p)).toSet
        assert(got == want)
      } finally spark.conf.unset(RangeJoinRule.MaxSpanKey)
    }
  }
}
