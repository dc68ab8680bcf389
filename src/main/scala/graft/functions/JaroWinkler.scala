package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression —
  * the typo-tolerant member of the engine's similarity-join toolbox
  * (token-set: n-gram Jaccard; bounded edits: [[graft.llm.EditDistance]]
  * Ed-Join; prefix-weighted character similarity: this).
  *
  * Semantics pinned to the classic Winkler 1990 definition, which is
  * also what the DuckDB oracle's `jaro_winkler_similarity` computes
  * (verified value-for-value in JaroWinklerSpec against DuckDB 1.0
  * outputs, e.g. MARTHA/MARHTA = 0.9611..., DWAYNE/DUANE = 0.84):
  *
  *   - match window = floor(max(|a|,|b|)/2) - 1 (window 0 still allows
  *     same-position matches, so "ab"/"ba" scores 0);
  *   - transpositions = half the out-of-order matched pairs;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, 0 when m = 0;
  *   - Winkler prefix boost `jaro + l*0.1*(1-jaro)` (l = common prefix,
  *     capped at 4) applies only when jaro > 0.7 — below the boost
  *     threshold the plain Jaro value is returned (DuckDB behavior:
  *     jaro_winkler('abcdefgh','abzzzzzz') = jaro = 0.5, unboosted);
  *   - either side empty → 0.0 (DuckDB returns 0 even for ''/'' —
  *     preserved bug-for-bug so oracle hashes match).
  *
  * The engine iterates UTF-16 code units; the oracle iterates UTF-8
  * bytes. Identical on ASCII (all driver-table name/text columns the
  * registry queries feed it); for non-ASCII input the two domains
  * diverge (multi-byte chars shift lengths, match windows and prefix
  * counts) — the boundary is PINNED, not just narrated, by
  * JaroWinklerSpec's "non-ASCII boundary" test: exact values for both
  * domains on accented Latin, Greek, CJK and astral (surrogate-pair)
  * fixtures, e.g. café/cafe = 0.8833 (engine) vs 0.8483 (byte oracle).
  *
  * 100 TB design note: this is a SCALAR — the quadratic all-pairs
  * problem stays with the caller. [[graft.ops.Relational]]'s
  * `jaroWinklerPairs` only evaluates it on blocked candidate pairs
  * (brand × first-letter blocks), never on a cross join; the plan-audit
  * suite asserts no CartesianProductExec registry-wide.
  */
object JaroWinklerOps {

  /** Plain Jaro similarity over UTF-16 code units. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk matched chars in order on both sides; each position where the
    // matched characters differ contributes half a transposition
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    val t = halfT / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Winkler boost: prefix-scaled only above the 0.7 threshold. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Codegen entry point (UTF8String overload). */
  def jw(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)
}

/** `graft_jaro_winkler(string, string) -> double` — see [[JaroWinklerOps]]. */
case class JaroWinklerExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerOps.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerOps.jw($a, $b);")
}

object JaroWinkler {
  /** Column-API access to the native expression. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      JaroWinklerExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
