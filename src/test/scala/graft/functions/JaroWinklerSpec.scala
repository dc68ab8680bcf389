package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[JaroWinklerOps]] to the DuckDB `jaro_winkler_similarity`
  * semantics the oracle replays (values below captured from DuckDB
  * 1.0.0), plus codegen/interpreted agreement and scalar properties. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String) = JaroWinklerOps.jaroWinkler(a, b)

  test("classic Winkler paper pairs match DuckDB exactly") {
    // captured: select jaro_winkler_similarity(a, b) in DuckDB 1.0.0
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("apple inc", "apple incorporated") === 0.9)
  }

  test("prefix boost is withheld at or below the 0.7 jaro threshold") {
    // both pairs share a 2+ char prefix; jaro <= 0.7 so jw == jaro
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
    assert(jw("aaaa", "aazz") === 0.6666666666666666)
    // and a pair just over the threshold IS boosted
    assert(jw("DIXON", "DICKSONX") > JaroWinklerOps.jaro("DIXON", "DICKSONX"))
  }

  test("edge cases: empties, identity, window-0 transposition") {
    assert(jw("", "") === 0.0)     // DuckDB's convention, not 1.0
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "a") === 1.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0) // match window floor(2/2)-1 = 0
  }

  test("symmetry and range on fuzzed ASCII strings") {
    val rnd = new scala.util.Random(42)
    def s() = (0 until rnd.nextInt(12)).map(_ =>
      ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 5000) {
      val (a, b) = (s(), s())
      val x = jw(a, b)
      assert(x === jw(b, a), s"asymmetric on '$a'/'$b'")
      assert(x >= 0.0 && x <= 1.0, s"out of range on '$a'/'$b': $x")
      if (a == b && a.nonEmpty) assert(x === 1.0)
    }
  }

  test("1008-pair DuckDB fixture: every value identical, bit-for-bit") {
    // pre-computed by the ORACLE ENGINE itself (DuckDB 1.0.0
    // jaro_winkler_similarity over seeded random + adversarial pairs:
    // shared prefixes, transpositions, repeats, empties, length skews)
    // — the strongest fidelity pin available offline. Doubles compare
    // EXACTLY: both engines compute the same rational arithmetic in
    // IEEE doubles, so any difference is a semantics bug, not noise.
    val path = getClass.getResource("/jaro_winkler_duckdb.jsonl")
    assume(path != null, "fixture missing from test resources")
    val rows = spark.read
      .schema("a string, b string, jw double")
      .json(path.getPath)
      .collect()
    assert(rows.length === 1008)
    rows.foreach { r =>
      val (a, b, want) = (r.getString(0), r.getString(1), r.getDouble(2))
      val got = jw(a, b)
      assert(got === want,
        s"divergence from DuckDB on ('$a', '$b'): got $got want $want")
    }
  }

  test("SQL function graft_jaro_winkler resolves after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .collect().head.getDouble(0)
    assert(got === 0.9611111111111111)
  }

  test("expression: codegen path equals the scalar function, nulls propagate") {
    val rnd = new scala.util.Random(7)
    def s() = (0 until rnd.nextInt(10)).map(_ =>
      ('a' + rnd.nextInt(3)).toChar).mkString
    val pairs = Seq.fill(500)((s(), s())) :+ (null, "x") :+ ("x", null)
    val df = spark.createDataFrame(pairs).toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        JaroWinkler.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)))
    }
  }
}
