package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions: the hot inner loops of SimHash and MinHash
  * as tight JVM loops invoked from generated code, replacing 32 (resp.
  * 16) interpreted higher-order `aggregate`/`transform` passes per row.
  * Results are bit-identical to the HOF forms (tested) and to the DuckDB
  * oracle's list-comprehension math.
  */
object SketchOps {

  /** 32-bit SimHash of token hashes: bit j = sign of the ±1 votes of
    * bit j across the hashes (empty input votes 0 ⇒ all bits set, same
    * as the HOF fold). */
  def simhash(ths: ArrayData, bits: Int): Long = {
    val n = ths.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = ths.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  /** MinHash signature of (distinct) shingle hashes under H universal
    * hashes `(a_j*x + b_j) mod P`; empty input ⇒ all-P signature. */
  def minhashSig(sh: ArrayData, numHashes: Int, prime: Long,
                 as: Array[Long], bs: Array[Long]): ArrayData = {
    val sig = Array.fill(numHashes)(prime)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val x = sh.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = Math.floorMod(as(j) * x + bs(j), prime)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Any-shingle Bloom hit over a token-hash array: for each k-gram of
    * `ths`, the polynomial combine (`fold acc*31+h mod prime`, seeded
    * with the first token hash — [[graft.llm.TextFns.shingleHashSetFromTokenHashes]]'s
    * exact math), probed against the packed filter words under the
    * `nHashes` universal hashes of `graft.llm.Dedup.bloomPos`; true iff
    * any shingle finds all its bits set. Fewer than k tokens ⇒ false
    * (no defined shingle), matching `exists` over the empty set. */
  def bloomShingleHit(ths: ArrayData, k: Int, prime: Long, bloomBits: Long,
                      nHashes: Int, words: Array[Long]): Boolean = {
    val n = ths.numElements()
    var i = 0
    while (i <= n - k) {
      var acc = ths.getLong(i)
      var o = 1
      while (o < k) {
        acc = Math.floorMod(acc * 31L + ths.getLong(i + o), prime)
        o += 1
      }
      var allSet = true
      var j = 0
      while (allSet && j < nHashes) {
        val a = (2654435761L * (j + 1) + 104729L) % prime
        val b = (97531L * (j + 1) + 12345L) % prime
        val p = Math.floorMod(Math.floorMod(a * acc + b, prime), bloomBits)
        allSet = (words((p / 64L).toInt) & (1L << (p % 64L).toInt)) != 0L
        j += 1
      }
      if (allSet) return true
      i += 1
    }
    false
  }

  /** All k-token rolling window hashes of a token-hash array, in
    * position order: window at 0-based offset i covers `ths[i, i+k)`
    * and hashes to the same polynomial combine as the shingle math
    * (seed = first element, then `acc*31 + h mod prime`). Computed in
    * ONE O(n) pass via the rolling update — drop the outgoing term
    * (`ths[i]·31^(k-1)`), shift, add the incoming — instead of the
    * O(n·k) per-window refold a HOF spelling pays. Fewer than k
    * tokens ⇒ empty array (no defined window). */
  def windowHashes(ths: ArrayData, k: Int, prime: Long): ArrayData = {
    val n = ths.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = Math.floorMod(pow * 31L, prime); i += 1 }
    val out = new Array[Long](n - k + 1)
    var acc = Math.floorMod(ths.getLong(0), prime)
    var j = 1
    while (j < k) { acc = Math.floorMod(acc * 31L + ths.getLong(j), prime); j += 1 }
    out(0) = acc
    var s = 1
    while (s <= n - k) {
      acc = Math.floorMod(
        acc - Math.floorMod(Math.floorMod(ths.getLong(s - 1), prime) * pow, prime),
        prime)
      acc = Math.floorMod(acc * 31L + ths.getLong(s + k - 1), prime)
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Exact integer dot product. Lengths must match — the expression
    * nulls out mismatched pairs before calling, and the `require` turns
    * any out-of-contract caller into an exception rather than a silent
    * garbage read (`UnsafeArrayData.getLong` does not bounds-check). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** True iff any element slot is null. Only called when the array's
    * schema admits nulls (`containsNull=true`) — see [[DotQExpression]]. */
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** `dot_q(array<bigint>, array<bigint>) -> bigint`: exact integer dot
  * product of two quantized vectors — the ANN hot loop as generated
  * code instead of an interpreted zip_with/aggregate chain.
  *
  * Mismatched lengths yield NULL, bit-identical to the [[dotQHof]] twin
  * (`zip_with` pads the shorter side with nulls ⇒ the aggregate goes
  * NULL). A null ELEMENT likewise yields NULL (the HOF's `acc + null`
  * poisons the fold) — but the element-null scan is emitted only when a
  * child's schema has `containsNull=true`; for the engine's own vectors
  * (containsNull=false after quantize) the generated code is the bare
  * length check + loop, so neither branch fires on the hot path. */
case class DotQExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_q"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQExpression =
    copy(left = newLeft, right = newRight)

  /** Static: does either child's schema admit null elements? Decided at
    * plan time, so containsNull=false vectors pay no per-row null scan. */
  private def mayHaveNullElements: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (l, r) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (l.numElements() != r.numElements()) null
    else if (mayHaveNullElements &&
      (SketchOps.hasNullElement(l) || SketchOps.hasNullElement(r))) null
    else SketchOps.dot(l, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // single-line fragment: a multi-line snippet interpolated into the
      // stripMargin template below would have its leading '|' of '||'
      // eaten by the outer stripMargin (the documented double-stripMargin
      // trap), silently turning short-circuit '||' into bitwise '|'
      val nullScan =
        if (mayHaveNullElements)
          s" || graft.functions.SketchOps.hasNullElement($a)" +
            s" || graft.functions.SketchOps.hasNullElement($b)"
        else ""
      s"""if ($a.numElements() != $b.numElements()$nullScan) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SketchOps.dot($a, $b);
         |}""".stripMargin
    })
}

/** `simhash(array<bigint>) -> bigint` — see [[SketchOps.simhash]]. */
case class SimHashExpression(child: Expression, bits: Int = 32) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SketchOps.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.simhash($c, $bits);")
}

/** `minhash_sig(array<bigint>) -> array<bigint>` — see
  * [[SketchOps.minhashSig]]. The hash-family constants are baked in as
  * two static arrays referenced from generated code. */
case class MinHashSigExpression(
    child: Expression,
    numHashes: Int,
    prime: Long,
    as: Seq[Long],
    bs: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpression =
    copy(child = newChild)

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    SketchOps.minhashSig(input.asInstanceOf[ArrayData], numHashes, prime, asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.SketchOps.minhashSig(
         |  $c, $numHashes, ${prime}L, $asRef, $bsRef);""".stripMargin)
  }
}

/** `bloom_shingle_hit(array<bigint>) -> boolean` — see
  * [[SketchOps.bloomShingleHit]]. Exists because the column form of the
  * same test (`exists(shingleHashSet(ths), bloomProbe)`) is destroyed
  * by predicate pushdown: the filter is pushed below the projections
  * that stage `ths`/`sh` as attributes, re-inlining the token-hash
  * expression into every `element_at` reference of the shingle lambda —
  * k re-evaluations of the FULL per-doc token-hash array per shingle
  * (measured 23× on the streaming curation gate). A native expression
  * evaluates its child exactly once per row no matter where the
  * optimizer moves the predicate, so the gate survives pushdown at
  * full scan speed. The filter words are plan-time constants
  * (reference-object in codegen), bounded by the Bloom m parameter —
  * 4 KB — never by eval-set size. */
case class BloomShingleHitExpression(
    child: Expression,
    k: Int,
    prime: Long,
    bloomBits: Long,
    nHashes: Int,
    words: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_shingle_hit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomShingleHitExpression =
    copy(child = newChild)

  @transient private lazy val wordsArr = words.toArray

  override def nullSafeEval(input: Any): Any =
    SketchOps.bloomShingleHit(
      input.asInstanceOf[ArrayData], k, prime, bloomBits, nHashes, wordsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", wordsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.SketchOps.bloomShingleHit(
         |  $c, $k, ${prime}L, ${bloomBits}L, $nHashes, $wordsRef);""".stripMargin)
  }
}

/** `window_hashes(array<bigint>) -> array<bigint>` — see
  * [[SketchOps.windowHashes]]. The stride-1 window explode behind
  * exact-substring dedup: one O(n) rolling pass per row where the
  * column-form refold is O(n·k) interpreted lambda evaluations, and a
  * native child is evaluated exactly once per row no matter where the
  * optimizer moves the consuming expression (the same no-CSE-in-HOFs
  * trap every other sketch expression here exists to dodge). */
case class WindowHashesExpression(
    child: Expression,
    k: Int,
    prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires array<bigint>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SketchOps.windowHashes(input.asInstanceOf[ArrayData], k, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.windowHashes($c, $k, ${prime}L);")
}

object SketchExpressions {
  import org.apache.spark.sql.GraftColumnBridge._

  def simhashCol(ths: Column, bits: Int = 32): Column =
    column(SimHashExpression(expression(ths), bits))

  def minhashSigCol(sh: Column, numHashes: Int, prime: Long,
                    as: Seq[Long], bs: Seq[Long]): Column =
    column(MinHashSigExpression(expression(sh), numHashes, prime, as, bs))

  def dotQCol(a: Column, b: Column): Column =
    column(DotQExpression(expression(a), expression(b)))

  def bloomShingleHitCol(ths: Column, k: Int, prime: Long, bloomBits: Long,
                         nHashes: Int, words: Seq[Long]): Column =
    column(BloomShingleHitExpression(
      expression(ths), k, prime, bloomBits, nHashes, words))

  def windowHashesCol(ths: Column, k: Int, prime: Long): Column =
    column(WindowHashesExpression(expression(ths), k, prime))
}
