package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sessionization: lag/cumsum form vs native session_window. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long)*) = // (event_id, user_id, epoch sec)
    rows.toSeq.map { case (e, u, s) => (e, u, new Timestamp(s * 1000L)) }
      .toDF("event_id", "user_id", "ts")

  test("hllWeeklyUsers: re-agg invariant, error-bounded, exact side exact") {
    // 2 ISO weeks × 7 days, ~5k distinct users — enough to push the
    // lgK=12 sketch past exact coupon mode into real HLL estimation,
    // so the invariants are tested where they're non-trivial.
    // 1704067200 = 2024-01-01 00:00:00 UTC (a Monday).
    val df = spark.range(28000).select(
      col("id").as("event_id"),
      pmod(col("id") * 2654435761L, lit(5001L)).as("user_id"),
      expr("cast(1704067200 + (id % 14) * 86400 + (id div 14) % 3600 " +
        "as timestamp)").as("ts"))
    val got = Windows.hllWeeklyUsers(df).collect()
      .map(r => r.getAs[String]("week") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("exact_users"),
          r.getAs[Long]("est_ok"), r.getAs[Long]("merge_invariant"))).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-08"))
    val exact = df.filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(got("2024-01-01") == (7L, exact, 1L, 1L))
    val (d2, e2, ok2, inv2) = got("2024-01-08")
    assert(d2 == 7L && e2 > 4000L && ok2 == 1L && inv2 == 1L)
  }

  test("dailyEwma: hand-computed fixed-point recurrence with one spike") {
    // one type, 4 days, counts [100, 100, 300, 100]
    val counts = Seq(100, 100, 300, 100)
    val df = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (d.toLong * 1000 + i,
        new Timestamp((1704067200L + d * 86400L + i) * 1000L)))
    }.toDF("event_id", "ts")
      .withColumn("event_type", lit("click"))
      .withColumn("user_id", lit(1L))
    val got = Windows.dailyEwma(df).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("ewma_milli"),
          r.getAs[Long]("is_spike"))).toMap
    assert(got("2024-01-01") == (100L, 100000L, 0L))
    assert(got("2024-01-02") == (100L, 100000L, 0L))
    // 300*1e6 > 2000*100000 => spike; e = (300*300000 + 700*100000)/1000
    assert(got("2024-01-03") == (300L, 160000L, 1L))
    assert(got("2024-01-04") == (100L, 142000L, 0L))
  }

  test("sessionConcurrency: endpoint-sharing sessions overlap, back-to-back don't") {
    // u1: [1000, 2000]; u2: [2000, 3000] — share second 2000 => peak 2
    // u3: [3001, 4000] — starts after u2 ends => no third overlap
    val df = ev(
      (1L, 1L, 1000L), (2L, 1L, 2000L),
      (3L, 2L, 2000L), (4L, 2L, 3000L),
      (5L, 3L, 3001L), (6L, 3L, 4000L))
    val r = Windows.sessionConcurrency(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_sessions") == 3L)
    assert(r.head.getAs[Long]("peak_concurrent") == 2L)
  }

  test("eventPropStats: JSON keys extract, missing keys counted not zeroed") {
    import spark.implicits._
    val df = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("click", """{"other": 1}"""),   // k missing
      ("view", """{"k": 10}"""))
      .toDF("event_type", "props")
    val got = Windows.eventPropStats(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("k_sum"),
          r.getAs[Long]("k_max"), r.getAs[Long]("n_missing"),
          r.getAs[Long]("mean_k"))).toMap
    assert(got("click") == (3L, 12L, 7L, 1L, 4L))
    assert(got("view") == (1L, 10L, 10L, 0L, 10L))
  }

  test("sessionStats: hand-computed rollup over mixed sessions") {
    // u7: [1000,1100] (2 ev, dur 100) + [4001] (1 ev); u9: [500] (1 ev)
    val df = ev(
      (1L, 7L, 1000L), (2L, 7L, 1100L),
      (3L, 7L, 1100L + 1801L + 1100L),
      (4L, 9L, 500L))
    val r = Windows.sessionStats(df).collect().head
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("total_events") == 4L)
    assert(r.getAs[Long]("n_single") == 2L)
    assert(r.getAs[Long]("mean_events_pm") == 1333L)
    assert(r.getAs[Long]("total_dur_sec") == 100L)
    assert(r.getAs[Long]("max_dur_sec") == 100L)
    assert(r.getAs[Long]("mean_dur_sec") == 33L)
  }

  test("userSessions splits on >30min gaps, deterministic ids") {
    val df = ev(
      (1L, 7L, 1000L), (2L, 7L, 1100L),          // session 1
      (3L, 7L, 1100L + 1801L + 1100L),           // session 2 (gap > 1800)
      (4L, 9L, 500L))                            // other user
    val got = Windows.userSessions(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (7L, 1L, 2L, 1000L, 1100L),
      (7L, 2L, 1L, 4001L, 4001L),
      (9L, 1L, 1L, 500L, 500L)))
  }

  test("exact-gap boundary: 1800s gap stays in the same session") {
    val df = ev((1L, 1L, 0L), (2L, 1L, 1800L))
    val got = Windows.userSessions(df).collect()
    assert(got.length == 1 && got.head.getAs[Long]("n_events") == 2L)
  }

  test("asofJoin: latest right value at or before each left row, per key") {
    val left = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 50L), (4L, 9L, 100L))
      .toDF("event_id", "user_id", "sec")
    val right = Seq((7L, 100L, 1.5), (7L, 150L, 2.5), (9L, 90L, 9.9))
      .toDF("user_id", "sec", "v")
    val got = Windows.asofJoin(left, right, "user_id", "sec", "v")
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("v"))).toMap
    assert(got(1L) == Some(1.5)) // same-sec right row counts (<=)
    assert(got(2L) == Some(2.5)) // latest prior wins
    assert(got(3L) == None)      // nothing at or before 50
    assert(got(4L) == Some(9.9)) // per-key isolation
  }

  test("native session_window agrees with the lag/cumsum form on session counts") {
    val df = ev(
      (1L, 7L, 1000L), (2L, 7L, 1100L), (3L, 7L, 9000L),
      (4L, 9L, 500L), (5L, 9L, 500L + 1700L), (6L, 9L, 500L + 1700L + 1700L))
    val viaLag = Windows.userSessions(df)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaNative = Windows.sessionWindowCounts(df)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaLag == viaNative)
    assert(viaLag == Set((7L, 2L, 3L), (9L, 1L, 3L)))
  }

  test("session_window pins row-for-row to flatMapGroupsWithState, exact-gap boundary included") {
    import org.apache.spark.sql.functions.col
    // Boundary semantics, established EMPIRICALLY (a first draft of this
    // test assumed an end-exclusive window and failed): Spark's
    // session_window merges an event landing exactly at the previous
    // window's end — sessions split only on a STRICTLY greater gap,
    // identical to the lag/cumsum and flatMapGroupsWithState forms. So
    // at the same gap value the native operator pins row-for-row to the
    // state machine, with window.end = last event + gap. This is the
    // twin validation behind the session_window_counts registry entry.
    val df = ev(
      (1L, 7L, 1000L), (2L, 7L, 2800L),        // exact 1800 gap: merges
      (3L, 7L, 2800L + 1799L),                 // 1799 merges
      (4L, 9L, 500L), (5L, 9L, 500L + 1801L),  // 1801 splits
      (6L, 9L, 500L + 1801L))                  // duplicate timestamp
    def native(gap: String) = Windows.sessionWindowCounts(df, gap)
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        (col("session_window.end").cast("long") - 1800L).as("session_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def state(gapSec: Long) = graft.streaming.StatefulSessions
      .sessionizeBatch(df, gapSec)
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
      .toSet
    assert(native("1800 seconds") == state(1800L))
    assert(native("1800 seconds") == Set(
      (7L, 1000L, 4599L, 3L),
      (9L, 500L, 500L, 1L), (9L, 2301L, 2301L, 2L)))
    // direction of the boundary: at gapSec 1799 the state machine
    // splits the exact-1800 pair that the native operator (gap 1800)
    // keeps — the inclusive boundary is real, not a fixture accident
    assert(native("1800 seconds") != state(1799L))
  }

  test("eventTypePivot: dense day-by-type matrix with pinned columns") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-01 10:00:00", "click"),
      ("2024-01-01 11:00:00", "click"),
      ("2024-01-01 12:00:00", "view"),
      ("2024-01-02 09:00:00", "error"))
      .toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
    val piv = Windows.eventTypePivot(df)
    // the schema is PINNED by the type list, never inferred from data
    assert(piv.columns.toSeq ==
      Seq("day", "click", "error", "purchase", "signup", "view"))
    val got = piv.collect().map(r => r.getAs[String]("day") ->
      ((r.getAs[Long]("click"), r.getAs[Long]("error"),
        r.getAs[Long]("purchase"), r.getAs[Long]("signup"),
        r.getAs[Long]("view")))).toMap
    assert(got("2024-01-01") == ((2L, 0L, 0L, 0L, 1L)))
    assert(got("2024-01-02") == ((0L, 1L, 0L, 0L, 0L)))
  }

  private def tev(rows: (Long, Long, String)*) = // (user_id, epoch sec, type)
    rows.toSeq.map { case (u, s, t) => (u, new Timestamp(s * 1000L), t) }
      .toDF("user_id", "ts", "event_type")

  test("eventFunnel: strict-prefix ordering, not did-each-stage-ever-happen") {
    val df = tev(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2's only click PRECEDES its first view — depth 1
      (2L, 90L, "click"), (2L, 100L, "view"),
      // u3's purchase precedes its click — depth 2
      (3L, 100L, "view"), (3L, 150L, "click"), (3L, 120L, "purchase"),
      // u4 never views — counted nowhere
      (4L, 10L, "purchase"),
      // same-second chain passes (>= semantics)
      (5L, 100L, "view"), (5L, 100L, "click"), (5L, 100L, "purchase"))
    val got = Windows.eventFunnel(df).collect()
      .map(r => r.getAs[Long]("stage_idx") ->
        ((r.getAs[String]("stage"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_pm"), Option(r.getAs[Any]("step_pm"))))).toMap
    assert(got(0L) == (("view", 4L, 1000L, None)))
    assert(got(1L) == (("click", 3L, 750L, Some(750L))))
    assert(got(2L) == (("purchase", 2L, 500L, Some(666L))))
  }

  test("cohortRetention: min-day cohorts, same-day dups collapse") {
    val d = 86400L
    val df = tev(
      (1L, 10L, "view"), (1L, d + 10L, "click"), (1L, 3 * d + 10L, "view"),
      // u2: two events on day 1 collapse to one active day
      (2L, d + 5L, "view"), (2L, d + 6L, "view"), (2L, 2 * d + 5L, "click"),
      (3L, 20L, "view"))
    val got = Windows.cohortRetention(df).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_pm")))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1000L)))
    assert(got((0L, 1L)) == ((1L, 2L, 500L)))
    assert(got((0L, 3L)) == ((1L, 2L, 500L)))
    assert(got((1L, 0L)) == ((1L, 1L, 1000L)))
    assert(got((1L, 1L)) == ((1L, 1L, 1000L)))
    assert(got.size == 5)
  }

  test("valueOutliers: discrete lower median, MAD, 3*MAD count") {
    import spark.implicits._
    val df = Seq(
      // odd count: med 2, MAD 1, one 3*MAD outlier (98 > 3)
      ("m", 0.0), ("m", 1.0), ("m", 2.0), ("m", 3.0), ("m", 100.0),
      // even count: LOWER median 2 (not interpolated 2.5), MAD 1, none
      ("e", 1.0), ("e", 2.0), ("e", 3.0), ("e", 4.0))
      .toDF("event_type", "value")
    val got = Windows.valueOutliers(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("median_micro"),
          r.getAs[Long]("mad_micro"), r.getAs[Long]("n_outliers"),
          r.getAs[Long]("outlier_pm")))).toMap
    assert(got("m") == ((5L, 2000000L, 1000000L, 1L, 200L)))
    assert(got("e") == ((4L, 2000000L, 1000000L, 0L, 0L)))
  }

  test("rollingActiveUsers: trailing window, distinct users, span-clipped") {
    val d = 86400L
    val df = tev(
      (1L, 5L, "view"), (1L, 10L, "view"),      // u1 day 0 (twice)
      (2L, d + 5L, "view"),                     // u2 day 1
      (1L, 4 * d + 5L, "view"))                 // u1 again day 4
    val got = Windows.rollingActiveUsers(df, windowDays = 3).collect()
      .map(r => r.getAs[Long]("report_day") ->
        r.getAs[Long]("active_users")).toMap
    // day 0: {u1}; day 1: {u1,u2}; day 2: {u1,u2}; day 3: {u2};
    // day 4: {u1}; days 5,6 clipped (past max data day)
    assert(got == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("eventTransitions: per-user consecutive pairs, row-normalized") {
    val df = Seq(
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"),
      (3L, 1L, 300L, "view"), (4L, 1L, 400L, "click"),
      (5L, 2L, 100L, "view"), (6L, 2L, 200L, "purchase"),
      (7L, 3L, 50L, "error")) // single event -> no transition
      .map { case (e, u, s, t) => (e, u, new Timestamp(s * 1000L), t) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Windows.eventTransitions(df).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("transition_pm")))).toMap
    // from "view": click x2 + purchase x1; from "click": view x1
    assert(got(("view", "click")) == ((2L, 666L)))
    assert(got(("view", "purchase")) == ((1L, 333L)))
    assert(got(("click", "view")) == ((1L, 1000L)))
    assert(got.size == 3)
  }

  test("funnelLatency: end-to-end seconds for completers only") {
    val df = tev(
      // u1 converts in 200s
      (1L, 100L, "view"), (1L, 150L, "click"), (1L, 300L, "purchase"),
      // u2 converts in 10s (same-second click)
      (2L, 0L, "view"), (2L, 0L, "click"), (2L, 10L, "purchase"),
      // u3 never completes (purchase precedes click)
      (3L, 0L, "view"), (3L, 50L, "purchase"), (3L, 60L, "click"),
      // u4 converts in 500s
      (4L, 0L, "view"), (4L, 400L, "click"), (4L, 500L, "purchase"))
    val r = Windows.funnelLatency(df).collect().head
    assert(r.getAs[Long]("n_converted") == 3L)
    assert(r.getAs[Long]("min_sec") == 10L)
    assert(r.getAs[Long]("median_sec") == 200L)
    assert(r.getAs[Long]("max_sec") == 500L)
  }
}
