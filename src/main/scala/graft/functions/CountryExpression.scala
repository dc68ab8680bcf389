package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native P-8/U-3 country heuristic — one JVM pass replacing two
  * `regexp_replace` and a `split` per row. Exact column-form semantics
  * (see [[Country.extractCountry]], tested equivalent):
  *   - no comma ⇒ "NULL" (the NULL-input case is handled by
  *     `nullSafeEval`, which matches the column's isNotNull guard
  *     because its `otherwise` branch also yields "NULL"… except for
  *     actual SQL NULL in, where both produce "NULL" via the guard);
  *   - strip *trailing* commas, split on ',' keeping empties
  *     (Java-split emulation, same as the column form);
  *   - "clean" the last field by deleting non-overlapping
  *     `<punct>]` 2-char matches — the reference's
  *     `[\p{Punct}&&[^a-zA-Z]]]` quirk, preserved bug-for-bug;
  *   - exactly-2 code points after space-trim AND exactly 2 fields ⇒
  *     "USA", else the (uncleaned) last field;
  *   - result upper-cased after space-only trim.
  */
object CountryOps {

  private val Punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  private def isPunct(c: Char): Boolean = c < 128 && Punct.indexOf(c) >= 0

  private def trimSpaces(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  /** Delete non-overlapping `<punct>]` pairs, left to right — exactly
    * `replaceAll("[\p{Punct}&&[^a-zA-Z]]]", "")`. */
  private def removePunctBracket(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && isPunct(s.charAt(i)) && s.charAt(i + 1) == ']') i += 2
      else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private val NullSentinel: UTF8String = UTF8String.fromString("NULL")

  /** NULL input yields the "NULL" sentinel, like the column form's
    * `isNotNull` guard with `otherwise("NULL")`. Called from generated
    * code via the Scala static forwarder. */
  def extractOrNull(loc: UTF8String): UTF8String = {
    if (loc == null) return NullSentinel
    val s = loc.toString
    if (s.indexOf(',') < 0) return NullSentinel
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == ',') end -= 1
    val parts = s.substring(0, end).split(",", -1)
    val last = parts(parts.length - 1)
    val cleaned = trimSpaces(removePunctBracket(last))
    val chosen =
      if (cleaned.codePointCount(0, cleaned.length) == 2 && parts.length == 2) "USA"
      else last
    UTF8String.fromString(trimSpaces(chosen)).toUpperCase
  }
}

/** `graft_country(string) -> string` — see [[CountryOps]]. NULL input
  * yields the "NULL" sentinel (not SQL NULL), matching the column
  * form's `otherwise("NULL")` guard. */
case class CountryExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_country"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_country requires a string argument, got ${child.dataType}")

  override protected def withNewChildInternal(newChild: Expression): CountryExpression =
    copy(child = newChild)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    CountryOps.extractOrNull(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = graft.functions.CountryOps.extractOrNull(
          ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }
}
