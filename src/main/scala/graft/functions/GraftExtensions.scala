package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT graft_polyhash(text) ...")` plans the codegen'd
  * expression directly. [[GraftExtensions.register]] does the same
  * imperatively on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.polyhash)
}

object GraftExtensions {

  private[graft] val polyhash
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[PolyHashExpression].getName, "graft_polyhash"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"graft_polyhash expects exactly 1 argument, got ${children.length}")
      PolyHashExpression(children.head)
    })

  /** Imperative registration on a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(polyhash._1, polyhash._2, polyhash._3)

  /** Column-API access to the native expression (no registration needed). */
  def polyhashCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PolyHashExpression(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
