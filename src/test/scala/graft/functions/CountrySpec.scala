package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** P-8/U-3 country heuristic (`KafkaSparkProcessor.scala:198-210`),
  * FIXTURES.md A.1 cases. */
class CountrySpec extends SparkSpec {

  private def countries(locs: Seq[String]): Seq[String] =
    evalText[String](locs)(Country.extractCountry(col("text")))

  test("2-letter last field with exactly 2 fields => USA") {
    assert(countries(Seq("Boston, MA", "San Francisco, CA", "Austin, TX"))
      == Seq("USA", "USA", "USA"))
  }

  test("faithful quirk: any 2-letter second field maps to USA (London, UK)") {
    assert(countries(Seq("London, UK")) == Seq("USA"))
  }

  test("last comma-field upper-cased otherwise") {
    assert(countries(Seq("Toronto, Ontario", "São Paulo, Brazil",
      "Berlin, Germany, EU"))
      == Seq("ONTARIO", "BRAZIL", "EU")) // EU: 3 fields, so not the USA branch
  }

  test("no comma => NULL sentinel string") {
    assert(countries(Seq("Paris", "nowhere", "")) == Seq("NULL", "NULL", "NULL"))
  }

  test("defensive divergences: null location and bare comma do not throw") {
    val got = textDf("text", Seq(null, ",", " , "))
      .select(Country.extractCountry(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("NULL", "", ""))
  }

  test("native expression equals the HOF column twin on adversarial strings") {
    val piece = Gen.oneOf("Boston", "MA", "ca", " x ", "", "São", "12",
      "!]", "]]", "a!]b", "漢字", "😀x", " , ", "UK ]", "x]", "!,]")
    val loc = Gen.listOf(piece).map(_.mkString(","))
    val samples = Gen.listOfN(400, loc).apply(Gen.Parameters.default, Seed(23L)).get ++
      Seq(null, "", ",", ",,,", "a,!]", "a,b!]", " , ]", "x, ]]", "a,😀漢")
    val rows = textDf("text", samples).select(
      Country.extractCountry(col("text")).as("n"),
      Country.extractCountryHof(col("text")).as("h"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"mismatch for '${r.getString(2)}'")
    }
  }

  test("property: output is always NULL sentinel or trimmed upper-case") {
    val piece = Gen.oneOf("Boston", "MA", "ca", " x ", "", "São", "12")
    val loc = Gen.listOf(piece).map(_.mkString(","))
    val samples = Gen.listOfN(200, loc).apply(Gen.Parameters.default, Seed(3L)).get
    val got = countries(samples)
    assert(got.forall(c => c == "NULL" || (c == c.trim && c == c.toUpperCase)))
  }
}
