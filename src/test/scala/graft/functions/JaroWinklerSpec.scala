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

  test("non-ASCII boundary: UTF-16-unit engine vs UTF-8-byte oracle, pinned") {
    // The engine iterates UTF-16 code units; DuckDB's
    // jaro_winkler_similarity iterates UTF-8 BYTES. Same algorithm,
    // different symbol domain — identical whenever every symbol is one
    // ASCII unit on both sides, divergent otherwise (multi-byte chars
    // change lengths, match windows and prefix counts). This test makes
    // that boundary a PINNED fact instead of a doc sentence: a generic
    // reference of the identical algorithm runs over both domains, the
    // ASCII property is fuzz-checked, and known non-ASCII pairs assert
    // BOTH engines' exact values (so either side changing semantics
    // fails loudly).
    def jaroSeq(a: IndexedSeq[Int], b: IndexedSeq[Int]): Double = {
      val (la, lb) = (a.length, b.length)
      if (la == 0 || lb == 0) return 0.0
      val window = math.max(math.max(la, lb) / 2 - 1, 0)
      val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
      var m = 0
      for (i <- 0 until la) {
        var j = math.max(0, i - window); var found = false
        val hi = math.min(lb - 1, i + window)
        while (!found && j <= hi) {
          if (!bm(j) && a(i) == b(j)) { am(i) = true; bm(j) = true; m += 1; found = true }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var half = 0; var j = 0
      for (i <- 0 until la) if (am(i)) {
        while (!bm(j)) j += 1
        if (a(i) != b(j)) half += 1
        j += 1
      }
      val t = half / 2
      (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    }
    def jwSeq(a: IndexedSeq[Int], b: IndexedSeq[Int]): Double = {
      val jv = jaroSeq(a, b)
      if (jv <= 0.7) return jv
      var l = 0
      val mx = math.min(4, math.min(a.length, b.length))
      while (l < mx && a(l) == b(l)) l += 1
      jv + l * 0.1 * (1.0 - jv)
    }
    def bytes(s: String): IndexedSeq[Int] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toIndexedSeq.map(_ & 0xff)
    def units(s: String): IndexedSeq[Int] = s.map(_.toInt)

    // 1) the engine IS the generic algorithm over UTF-16 units
    //    (ASCII and non-ASCII alike)
    val rnd = new scala.util.Random(99)
    def ascii() = (0 until rnd.nextInt(10)).map(_ =>
      ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (ascii(), ascii())
      assert(jw(a, b) === jwSeq(units(a), units(b)))
      assert(jw(a, b) === jwSeq(bytes(a), bytes(b)),
        s"ASCII must be domain-independent: '$a'/'$b'")
    }

    // 2) pinned divergent pairs: (a, b, engine UTF-16 value, oracle
    //    UTF-8-byte value) — values captured from both domains
    val pinned = Seq(
      ("café", "cafe", 0.8833333333333334, 0.8483333333333334),
      ("über", "uber", 0.8333333333333334, 0.7833333333333333),
      ("naïve", "naive", 0.8933333333333333, 0.8577777777777779),
      ("schön", "schon", 0.9066666666666667, 0.8755555555555556),
      ("αβγδ", "αβγε", 0.8833333333333334, 0.95),
      ("日本語", "日本話", 0.8222222222222222, 0.9111111111111111),
      // astral plane: each emoji is TWO UTF-16 units (surrogate pair)
      // and FOUR UTF-8 bytes — both domains super-ASCII, still unequal
      ("😀😀", "😀😁", 0.8833333333333334, 0.95))
    pinned.foreach { case (a, b, engineWant, byteWant) =>
      assert(jw(a, b) === engineWant, s"engine value moved for '$a'/'$b'")
      assert(jwSeq(units(a), units(b)) === engineWant)
      assert(jwSeq(bytes(a), bytes(b)) === byteWant,
        s"byte-domain value moved for '$a'/'$b'")
      assert(engineWant !== byteWant)
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
