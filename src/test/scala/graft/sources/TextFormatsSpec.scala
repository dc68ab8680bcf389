package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-format ingest disciplines: corrupt records surface as counted
  * rows (never thrown tasks), and the columnar JSON codec is lossless.
  * The CSV/JSON file roundtrips are oracle-checked queries
  * (csv_roundtrip / json_roundtrip); this spec pins the failure-path
  * semantics the oracle can't express. */
class TextFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("PERMISSIVE corrupt-record accounting: bad rows counted, job survives") {
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name": "also ok"}""",
      """{"id": "not-a-number", "name": "bad type"}""",
      """not json at all""",
      """{"id": 5}""" // missing field is NOT corrupt — NULL, per spec
    ).toDF("value")
    val r = TextFormats.corruptRecordStats(lines, "id LONG, name STRING")
      .collect().head
    assert(r.getAs[Long]("n_good") == 3L)
    assert(r.getAs[Long]("n_bad") == 2L)
    assert(r.getAs[Long]("n_rows") == 5L)
  }

  test("columnar to_json/from_json roundtrip is lossless on a sample") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val src = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val back = TextFormats.jsonColumnRoundtrip(spark, "/root/testdata/sf0.001")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("csv read validates the header instead of trusting it") {
    val dir = java.nio.file.Files.createTempDirectory("csv_hdr").toString
    Seq((1L, "a"), (2L, "b")).toDF("x", "y")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    // matching schema: fine
    val ok = spark.read
      .schema("x LONG, y STRING").option("header", "true")
      .option("enforceSchema", "false").csv(dir)
    assert(ok.count() == 2)
    // wrong column names: enforceSchema=false must refuse, not
    // silently misassign columns
    intercept[Exception] {
      spark.read.schema("wrong LONG, names STRING").option("header", "true")
        .option("enforceSchema", "false").csv(dir).collect()
    }
  }
}
