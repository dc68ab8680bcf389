package graft

import org.apache.spark.sql.types._

/** Testdata schema canary (judge round-9 ask #3).
  *
  * The round-8/9 regression happened because the driver regenerated
  * `events.parquet` with a different timestamp encoding and nothing in the
  * unit suite read the REAL parquet: 5 oracle queries errored two rounds
  * before anyone noticed. This spec loads every table through [[Tables]]
  * from the actual driver testdata and pins the post-normalization schema
  * each registered query depends on, so the next schema drift fails ONE
  * named unit test immediately instead of a handful of oracle rows later.
  *
  * Types are pinned to what the query code actually requires today:
  *  - `events.ts` must normalize to TimestampType — `cast("long")` (epoch
  *    seconds) at Windows.scala / StatefulSessions.scala is illegal on
  *    TIMESTAMP_NTZ under ANSI (the exact round-8/9 failure).
  *  - date columns (`o_orderdate`, `l_shipdate`) may arrive as Timestamp
  *    or TimestampNTZ — queries only ever compare them to date literals
  *    and `cast("date")`, both legal for either — so the canary accepts
  *    both but rejects anything else (e.g. a move to raw int64 days).
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def haveTestdata(): Unit =
    assume(new java.io.File(sfDir).isDirectory, "driver testdata not present")

  private def fieldsOf(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sfDir)
      case other    => Tables(spark, sfDir, other)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private def anyTimestamp(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  test("events: ts normalizes to TimestampType (epoch-seconds casts stay legal)") {
    haveTestdata()
    val f = fieldsOf("events")
    assert(f("ts") == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${f("ts")} — " +
        "add a normalization branch in Tables.events for the new encoding")
    assert(f("event_id") == LongType && f("user_id") == LongType &&
      f("event_type") == StringType && f("value") == DoubleType &&
      f("props") == StringType, s"events columns drifted: $f")
  }

  test("documents / embeddings: dedup + ANN query surface column types") {
    haveTestdata()
    val d = fieldsOf("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType &&
      d("n_chars") == LongType, s"documents columns drifted: $d")
    val e = fieldsOf("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType,
      s"embeddings columns drifted: $e")
    assert(e("embedding") == ArrayType(FloatType) ||
      e("embedding") == ArrayType(FloatType, containsNull = true),
      s"embedding must be array<float>, got ${e("embedding")}")
  }

  test("TPC-H-ish tables: key / measure / date column types") {
    haveTestdata()
    val li = fieldsOf("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType &&
      li("l_extendedprice") == DoubleType && li("l_discount") == DoubleType &&
      li("l_returnflag") == StringType, s"lineitem columns drifted: $li")
    assert(anyTimestamp(li("l_shipdate")),
      s"l_shipdate must be a timestamp flavor, got ${li("l_shipdate")}")
    val o = fieldsOf("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_totalprice") == DoubleType, s"orders columns drifted: $o")
    assert(anyTimestamp(o("o_orderdate")),
      s"o_orderdate must be a timestamp flavor, got ${o("o_orderdate")}")
    val c = fieldsOf("customer")
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType &&
      c("c_mktsegment") == StringType, s"customer columns drifted: $c")
    assert(fieldsOf("nation")("n_nationkey") == IntegerType)
    assert(fieldsOf("region")("r_regionkey") == IntegerType)
    assert(fieldsOf("supplier")("s_suppkey") == LongType)
    assert(fieldsOf("part")("p_partkey") == LongType)
  }
}
