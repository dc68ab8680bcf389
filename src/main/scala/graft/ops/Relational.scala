package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics over the TPC-H-ish tables — the §3.3 analyst-query
  * surface (the reference delegates these to Drill/Tableau over the trend
  * store; Spark *is* our SQL engine, so they're first-class queries).
  *
  * Cross-engine float discipline: any aggregate over arbitrary doubles is
  * computed on per-row-rounded integer cents (`sumCents`) — integer sums
  * are associative, so the result is bit-identical regardless of partial
  * aggregation order on either engine; a single final division maps back
  * to the decimal domain deterministically.
  */
object Relational {

  /** `sum(round(x * 10^scale))` as exact integer units. */
  def sumCents(x: Column, scale: Int = 2): Column =
    sum(round(x * math.pow(10, scale).toLong).cast("long"))

  /** TPC-H Q1-shaped pricing summary: the canonical wide partial-agg
    * benchmark query (one shuffle over 6 groups; scans only the 7 needed
    * columns of lineitem). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sumCents(col("l_quantity")) / 100.0).as("sum_qty"),
        (sumCents(col("l_extendedprice")) / 100.0).as("sum_base_price"),
        (sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped: top-10 unshipped orders by revenue.
    * customer(filtered, small) broadcasts into orders⋈lineitem; the top-10
    * is `orderBy(...).limit(10)` on an exact integer revenue with orderkey
    * tiebreak — Catalyst plans TakeOrderedAndProject (per-partition top-k
    * + driver merge of 10-row heaps), never a global sort. */
  def topRevenueOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("date"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("date"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val revenue = li
      .join(broadcast(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey"))),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue_c"))
    revenue
      .orderBy(col("revenue_c").desc, col("o_orderkey"))
      .limit(10)
      .select(
        col("o_orderkey"),
        (col("revenue_c") / 10000.0).as("revenue"),
        col("o_orderdate"))
  }

  /** Region-level customer rollup: customer ⋈ broadcast(nation ⋈
    * broadcast(region)) — the dimensions are tiny at any scale, so the
    * fact table never shuffles for the join; only the 5-group aggregate
    * shuffles. */
  def customersByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_acctbal")
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_customers"),
        (sumCents(col("c_acctbal")) / 100.0).as("sum_acctbal"))
  }
}
