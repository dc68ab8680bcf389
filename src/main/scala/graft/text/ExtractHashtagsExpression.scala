package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native P-3+P-4 (tokenize + hashtag predicate): one JVM pass replacing
  * the interpreted `filter(split(text, " "), ...)` chain in the trend
  * hot path. Exact column-form semantics:
  *   - tokens = single-space regex split keeping empties;
  *   - keep tokens starting with '#' whose Java-`\s`-stripped length
  *     (in code points) exceeds 1.
  */
object HashtagOps {

  private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def extract(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && t.charAt(0) == '#') {
        // code-point count after stripping Java-\s chars
        var n = 0
        var j = 0
        while (j < t.length && n <= 1) {
          val cp = t.codePointAt(j)
          if (!isJavaSpace(cp)) n += 1
          j += Character.charCount(cp)
        }
        if (n > 1) out.add(UTF8String.fromString(t))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_hashtags(string) -> array<string>` — see [[HashtagOps]]. */
case class ExtractHashtagsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_hashtags"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hashtags requires a string argument, got ${child.dataType}")

  override protected def withNewChildInternal(newChild: Expression): ExtractHashtagsExpression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    HashtagOps.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.HashtagOps.extract($c);")
}
