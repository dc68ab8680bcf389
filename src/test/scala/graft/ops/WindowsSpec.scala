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
}
