package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-Min sketch — the frequency member of the engine's mergeable-
  * sketch algebra (distinct counts: [[Kmv]]/HLL; heavy hitters:
  * [[graft.llm.HeavyHitters]] Misra-Gries, which keeps IDENTITIES but
  * only of the top keys; quantiles: [[BottomK]]; point frequency of ANY
  * key, including ones never retained anywhere: this).
  *
  * Misra-Gries answers "which keys are frequent"; Count-Min answers
  * "how often did THIS key occur" for every key with a one-sided
  * ε-error — `true ≤ est ≤ true + ε·N` with probability 1−δ, where
  * ε = e/W and δ = e^−D. The sketch is D·W longs (D=3, W=512 → 12 KiB)
  * regardless of key cardinality, and merge is element-wise `+`:
  * sketch(A ⊎ B) = sketch(A) + sketch(B) EXACTLY (integer counters, no
  * FP), so per-partition partial sketches, per-day rollups and
  * arbitrary merge trees all land on the identical array — the
  * property that makes pre-sketched daily partitions safe to
  * re-aggregate forever at 100 TB.
  *
  * Hash family is the SQL-reconstructible affine family
  * `h_i(k) = ((a_i·(k mod⁺ P) + b_i) mod P) mod W` with P = 2^31−1 —
  * chosen (like [[graft.llm.Dedup]]'s MinHash family) so the DuckDB
  * oracle can rebuild every cell with plain integer arithmetic and the
  * estimates cross engines as exact BIGINTs, not approximations.
  * The key is reduced mod P FIRST (`mod⁺` = floor/positive mod, so
  * negative keys land in [0, P) on both engines): `a_i·(k mod⁺ P)`
  * stays below 2^55 (a_i < 2^24, k mod⁺ P < 2^31), so the arithmetic
  * cannot overflow Long for ANY Long key — the pre-round-13 form
  * `a_i·k` silently wrapped in the engine for |k| ≥ ~2^39 while the
  * DuckDB oracle raised an overflow error, a cross-engine divergence
  * mode; mod-first is congruent for every key both engines previously
  * agreed on (k mod⁺ P < P ⇒ identical buckets for all TPC-H keys) and
  * now agrees for the full Long domain (CountMinSpec pins
  * Long.MaxValue/MinValue against a BigInt ground truth).
  *
  * Estimation is a native Column (`least` of D `element_at`s over the
  * flattened sketch) — the sketch is one broadcastable row; probing a
  * billion keys is a map-side projection, no shuffle, no UDF.
  */
object CountMin {

  val D = 3
  val W = 512
  val P: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  val A: Array[Long] = Array(1299721L, 104729L, 15485863L)
  val B: Array[Long] = Array(7L, 13L, 31L)

  @inline private[graft] def bucket(i: Int, k: Long): Int =
    ((A(i) * Math.floorMod(k, P) + B(i)) % P % W).toInt

  /** Typed Aggregator: Long keys in, flat D·W counter array out.
    * Buffer starts empty (zero-length) so the common all-partial-empty
    * case allocates nothing; first reduce materializes the array. */
  final class CmsAgg
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], k: Long): Array[Long] = {
      val b = if (buf.length == 0) new Array[Long](D * W) else buf
      var i = 0
      while (i < D) { b(i * W + bucket(i, k)) += 1L; i += 1 }
      b
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.length == 0) return y
      if (y.length == 0) return x
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    def finish(buf: Array[Long]): Array[Long] =
      if (buf.length == 0) new Array[Long](D * W) else buf

    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Element-wise sum of sketches already materialized as arrays —
    * the rollup-tree merge (native columns, exact). */
  def merge2(a: Column, b: Column): Column = zip_with(a, b, _ + _)

  /** The empty sketch as a literal column (fold seed for rollups). */
  def zeroCol: Column = lit(new Array[Long](D * W))

  /** Point-frequency estimate of `key` against the flat sketch column:
    * `min_i sketch[i·W + h_i(key)]` — pure native arithmetic. */
  def estimate(sketch: Column, key: Column): Column = {
    val cells = (0 until D).map { i =>
      val h = (lit(A(i)) * pmod(key, lit(P)) + lit(B(i))) % P % W
      element_at(sketch, (lit(i * W) + h + 1).cast("int"))
    }
    least(cells: _*)
  }
}
