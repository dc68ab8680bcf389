package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization as native codegen'd expressions — the
  * step every large-scale text pipeline runs BEFORE hashing, dedup, or
  * tokenization: the same visible string has many byte encodings
  * ("é" as U+00E9 vs e+U+0301), and every hash-keyed operator in this
  * engine (exact dedup digests, MinHash shingles, BPE merges, n-gram
  * counts) treats those encodings as distinct documents unless the text
  * is normalized first. CCNet/C4-style pipelines canonicalize for
  * exactly this reason; the reference engine never needs to because its
  * tweet corpus arrives ASCII-cleaned (its 4-regex cleaner,
  * `SparkProcessor.scala` — see [[graft.text.TextOps.cleanTweetText]]),
  * so this module is part of the training-data surface, not the §2 port.
  *
  * Two operations, both pinned value-for-value to the DuckDB oracle
  * (UnicodeNormSpec):
  *
  *   - [[UnicodeNormOps.nfc]]: Unicode NFC (canonical decomposition +
  *     canonical composition, UAX#15) via `java.text.Normalizer` —
  *     byte-identical to DuckDB's `nfc_normalize` (both implement the
  *     stabilized UAX#15 algorithm; singletons map too, e.g. U+2126
  *     OHM SIGN → U+03A9 Ω, U+212B ANGSTROM → U+00C5 Å).
  *   - [[UnicodeNormOps.stripAccents]]: accent/diacritic folding with
  *     DuckDB `strip_accents` semantics, empirically pinned against
  *     DuckDB 1.0: NFD-decompose, drop every combining mark (Unicode
  *     categories Mn, Mc, Me — verified: U+0301 acute Mn, U+093E
  *     devanagari AA Mc, U+20DD enclosing circle Me all dropped), then
  *     NFC-recompose (verified: decomposed Hangul jamo U+1100 U+1161
  *     comes back as the composed syllable U+AC00). Letters that are
  *     not base+mark compositions pass through (ß, æ, ø, Đ, ł, the ﬁ
  *     ligature — folding those is transliteration, not accent
  *     stripping, and DuckDB agrees).
  *
  * Unicode-version note: Java 17 carries Unicode 13, DuckDB 1.0's
  * utf8proc a later table. UAX#15 normalization is STABILIZED (results
  * for assigned code points never change between versions), and the
  * mark categories of long-assigned combining chars are stable in
  * practice; characters assigned after Unicode 13 pass through Java
  * unnormalized — a documented, bounded divergence (none occur in any
  * driver table or fixture).
  *
  * 100 TB design: both are scalar projections inside whole-stage
  * codegen — no shuffle, no UDF (these are native Catalyst expressions
  * with `doGenCode`, so the plan-audit suite's zero-ScalaUDF invariant
  * holds). The dominant corpus case (pure-ASCII text) short-circuits on
  * a byte-count check (`numBytes == numChars` ⇔ every code point is
  * one UTF-8 byte ⇔ ASCII, which NFC and accent-folding both fix) —
  * the fast path never materializes a java.lang.String, so
  * canonicalizing an already-clean 100 TB corpus costs one integer
  * compare per row, and the non-ASCII slow path returns the INPUT
  * buffer (not a copy) whenever normalization is the identity. */
object UnicodeNormOps {

  /** NFC canonical normalization; ASCII fast path returns the input
    * buffer untouched. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val j = s.toString
    val n = Normalizer.normalize(j, Normalizer.Form.NFC)
    if (n == j) s else UTF8String.fromString(n)
  }

  /** DuckDB-`strip_accents` folding: NFC(drop-marks(NFD(s))).
    * ASCII fast path as [[nfc]]. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val j = s.toString
    val d = Normalizer.normalize(j, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val out = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    if (out == j) s else UTF8String.fromString(out)
  }
}

private[functions] trait UnicodeNormExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
}

/** `graft_nfc_normalize(string) -> string` — see [[UnicodeNormOps]]. */
case class NfcNormalizeExpression(child: Expression)
  extends UnicodeNormExpression {
  override def prettyName: String = "graft_nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpression = copy(child = newChild)
  override def nullSafeEval(s: Any): Any =
    UnicodeNormOps.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormOps.nfc($c)")
}

/** `graft_strip_accents(string) -> string` — see [[UnicodeNormOps]]. */
case class StripAccentsExpression(child: Expression)
  extends UnicodeNormExpression {
  override def prettyName: String = "graft_strip_accents"
  override protected def withNewChildInternal(newChild: Expression)
      : StripAccentsExpression = copy(child = newChild)
  override def nullSafeEval(s: Any): Any =
    UnicodeNormOps.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormOps.stripAccents($c)")
}

object UnicodeNorm {
  /** Column-API access to the native expressions. */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalizeExpression(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def stripAccentsCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      StripAccentsExpression(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
