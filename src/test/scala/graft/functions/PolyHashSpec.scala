package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.llm.TextFns

/** Native codegen'd PolyHashExpression vs the HOF column twin vs the
  * driver-side Scala reference — all three must agree bit-for-bit. */
class PolyHashSpec extends SparkSpec {

  test("native expression == HOF fold == Scala reference on random strings") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const("#tag"), Gen.const("é漢😀"),
      Gen.const(""), Gen.const(" spaced out ")))
      .map(_.mkString(" "))
    val samples = Gen.listOfN(200, gen).apply(Gen.Parameters.default, Seed(5L)).get
    val rows = textDf("text", samples)
      .select(
        TextFns.polyHash(col("text")).as("native"),
        TextFns.polyHashHof(col("text")).as("hof"),
        col("text"))
      .collect()
    rows.foreach { r =>
      val ref = PolyHashExpression.hash(r.getString(2))
      assert(r.getLong(0) == ref && r.getLong(1) == ref,
        s"mismatch for '${r.getString(2)}'")
    }
  }

  test("empty and null inputs") {
    val got = textDf("text", Seq("", null))
      .select(TextFns.polyHash(col("text")).as("h")).collect()
    assert(got(0).getLong(0) == 0L)
    assert(got(1).isNullAt(0))
  }

  test("SQL function graft_polyhash resolves after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_polyhash('hello') AS h").collect().head.getLong(0)
    assert(got == PolyHashExpression.hash("hello"))
  }

  test("SQL function graft_clean_tweet resolves after registration") {
    GraftExtensions.register(spark)
    // @user -> Foo (then stripped as leading), URL remnant and RT die
    val got = spark.sql(
      "SELECT graft_clean_tweet('@user hello http://x RT') AS c")
      .collect().head.getString(0)
    assert(got == " hello  ")
  }

  test("extensions class injects the function into a fresh session") {
    val ext = new GraftExtensions()
    // smoke the injector shape without booting a second session
    val captured = new org.apache.spark.sql.SparkSessionExtensions
    ext(captured) // must not throw
  }
}
