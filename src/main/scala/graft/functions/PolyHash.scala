package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * (`graft.llm.TextFns.polyHash` semantics: fold `acc*31 + codepoint`
  * mod 1e9+7 over the string's code points).
  *
  * This is the codegen'd fast path for the hash-heavy operators
  * (fingerprint, MinHash token hashing, SimHash): a tight `long` loop in
  * generated Java instead of an interpreted
  * `aggregate(split(s,""), ...)` higher-order chain — same result
  * bit-for-bit (tested against the column-function form), roughly an
  * order of magnitude less per-row overhead.
  *
  * Registered as SQL function `graft_polyhash` by [[GraftExtensions]].
  */
case class PolyHashExpression(child: Expression,
    mult: Long = 31L, prime: Long = PolyHashExpression.Prime)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires a string argument, got ${child.dataType}")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PolyHashExpression.hash(input.asInstanceOf[UTF8String].toString, mult, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int cp = $s.codePointAt($i);
         |  $acc = (($acc * ${mult}L) + (long) cp) % ${prime}L;
         |  $i += Character.charCount(cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

object PolyHashExpression {
  val Prime = 1000000007L

  /** Second, independent polynomial family (different multiplier AND
    * modulus): two strings colliding under the default (31, 1e9+7)
    * family collide here only by a fresh ~2⁻³⁰ accident — the
    * decorrelation the 64-bit streaming near-dup key is built on
    * ([[graft.streaming.DocStream.nearDupGate]]). A collision in
    * family 1 CANNOT be washed out downstream of the hash (every
    * function of an equal hash is equal), so the second family must
    * re-read the string itself, as this does. */
  val Mult2 = 37L
  val Prime2 = 998244353L

  /** Interpreted twin of the generated loop (code-point iteration, so
    * supplementary characters hash identically to `ascii()`-per-char). */
  def hash(s: String, mult: Long = 31L, prime: Long = Prime): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % prime
      i += Character.charCount(cp)
    }
    acc
  }
}
