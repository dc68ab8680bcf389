package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins._

/** Join-strategy profile of the whole registry: for every query, the
  * count of each physical join strategy in its (pre-AQE) executed plan
  * — the companion to PLANS.md that a diff can actually alert on, and
  * the generator for PlanAuditSpec's join-strategy pin. A broadcast
  * silently flipping to a sort-merge join when a side outgrows the
  * broadcast threshold at a bigger scale factor is the classic
  * plan regression this surfaces: run at two SFs and diff.
  *
  * Usage: graft.JoinProfile <sfDir> [outPath] — prints one JSON object
  * {query: {strategy: count}}, omitting queries with no joins. */
object JoinProfile {

  def profile(plan: SparkPlan): Map[String, Int] = {
    // unwrap AQE wrappers — their pre-execution plan hangs off fields,
    // not children (same walk as the test suite's SparkSpec.planNodes)
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: nodes(q.plan)
        case other => Seq(other)
      }
      self ++ (p.children ++ p.subqueries).flatMap(nodes)
    }
    nodes(plan).collect {
      case _: BroadcastHashJoinExec => "broadcast_hash"
      case _: SortMergeJoinExec => "sort_merge"
      case _: ShuffledHashJoinExec => "shuffled_hash"
      case _: BroadcastNestedLoopJoinExec => "broadcast_nested_loop"
      case _: CartesianProductExec => "cartesian"
    }.groupBy(identity).map { case (k, v) => (k, v.size) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p = profile(fn(spark, sfDir).queryExecution.executedPlan)
        if (p.isEmpty) None
        else Some(s""""$name":{${p.toSeq.sorted
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")}}""")
    }
    // build from a Seq of fragments so the no-join-anywhere case stays
    // valid JSON (a bare interpolation left a trailing comma there)
    val json = (s""""sf_dir":"$sfDir"""" +: rows).mkString("{", ",", "}")
    println(json)
    out.foreach(o => java.nio.file.Files.write(java.nio.file.Paths.get(o),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    spark.stop()
  }
}
