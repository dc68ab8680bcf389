package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import UnicodeNorm.{nfcNormalize, stripAccentsCol}

/** Pins [[UnicodeNormOps]] to DuckDB 1.0's `nfc_normalize` /
  * `strip_accents` semantics value-for-value — every expectation below
  * was computed by the oracle engine itself (DuckDB 1.0, 2026-08-15),
  * so a pass here means the oracle-hash parity of the registry queries
  * is a property of the FUNCTIONS, not of ASCII-only inputs. */
class UnicodeNormSpec extends SparkSpec {

  private def nfc(s: String): String =
    UnicodeNormOps.nfc(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    UnicodeNormOps.stripAccents(UTF8String.fromString(s)).toString

  test("nfc: combining sequences compose (DuckDB-pinned)") {
    assert(nfc("é") === "é")            // e + acute → é
    assert(nfc("ö") === "ö")            // o + diaeresis → ö
    assert(nfc("Å") === "Å")            // A + ring → Å
    assert(nfc("가") === "가")       // jamo → 가
  }

  test("nfc: singletons map, compatibility chars do not (DuckDB-pinned)") {
    assert(nfc("Ω") === "Ω")             // OHM SIGN → Ω
    assert(nfc("Å") === "Å")             // ANGSTROM → Å
    assert(nfc("ﬁ") === "ﬁ")             // ﬁ ligature untouched (NFC ≠ NFKC)
    assert(nfc("Ǆ") === "Ǆ")             // Ǆ untouched (compat-only decomp)
  }

  test("nfc: already-canonical and ASCII are identity (same buffer)") {
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeNormOps.nfc(ascii) eq ascii)     // fast path: no copy
    assert(nfc("élève") === "élève")
    assert(nfc("北京") === "北京")
  }

  test("strip_accents: NFD → drop marks → NFC recompose (DuckDB-pinned)") {
    assert(strip("élève") === "eleve")   // élève
    assert(strip("crème brûlée") === "creme brulee")
    assert(strip("Ñandú") === "Nandu")   // Ñandú
    assert(strip("ḉ") === "c")                // ç with acute (two marks)
    assert(strip("Å") === "A")                // ANGSTROM: singleton then mark drop
    assert(strip("ώ") === "ω")           // ώ → ω
    assert(strip("ѐ") === "е")           // cyrillic ѐ → е
    // recomposition proof: decomposed jamo with no marks comes back composed
    assert(strip("가x́") === "가x")
  }

  test("strip_accents: drops all three mark categories (DuckDB-pinned)") {
    assert(strip("b́") === "b")               // Mn (combining acute)
    assert(strip("का") === "क")     // Mc (devanagari AA sign)
    assert(strip("a⃝") === "a")               // Me (enclosing circle)
  }

  test("strip_accents: non-mark letters pass through (DuckDB-pinned)") {
    for (s <- Seq("ß", "æ", "ø", "Đ", "ł", "ﬁ",
        "北京", "Ω"))
      assert(strip(s) === s, s"expected pass-through for ${s}")
    val ascii = UTF8String.fromString("no accents here")
    assert(UnicodeNormOps.stripAccents(ascii) eq ascii)
  }

  test("expressions: codegen and interpreted agree; nulls propagate") {
    val df = textDf("text", Seq("élève", "plain", null))
    val got = df.select(nfcNormalize(col("text")).as("n"),
        stripAccentsCol(col("text")).as("s")).collect()
    assert(got(0).getString(0) === "élève")
    assert(got(0).getString(1) === "eleve")
    assert(got(1).getString(0) === "plain")
    assert(got(1).getString(1) === "plain")
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
    // the same values through the SQL-text path (session extension)
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("un_v")
    val sql = spark.sql("""SELECT graft_nfc_normalize(text) AS n,
        graft_strip_accents(text) AS s FROM un_v WHERE text IS NOT NULL""")
      .collect()
    assert(sql(0).getString(0) === "élève")
    assert(sql(0).getString(1) === "eleve")
  }

  test("unicodeNormStats invariants on a synthetic corpus") {
    val docs = textDf("text", Seq("hello world", "zzz", "echo echo"))
      .withColumn("doc_id", monotonically_increasing_id())
    val r = graft.llm.TextAnalysis.unicodeNormStats(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") === 3L)
    val raw = r.getAs[Long]("sum_raw_chars")
    // +1 code point per e/o: hello world (3) + zzz (0) + echo echo (4)
    assert(r.getAs[Long]("sum_dec_chars") === raw + 7L)
    // NFC composes every injected pair back to one code point
    assert(r.getAs[Long]("sum_nfc_chars") === raw)
    assert(r.getAs[Long]("n_noncanonical") === 2L)  // zzz has no e/o
    assert(r.getAs[Long]("n_fold_roundtrip") === 3L)
  }
}
