package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bottom-k SAMPLE sketch — the quantile member of the engine's
  * mergeable-sketch algebra (distinct counts: [[Kmv]]/HLL; heavy
  * hitters: [[graft.llm.HeavyHitters]] Misra-Gries; quantiles: this).
  *
  * The sketch retains the (hash, value) pairs whose flipped
  * `xxhash64(row identity)` is among the k smallest — a uniform
  * without-replacement sample of row identities that is a FUNCTION OF
  * THE INPUT SET: insertion order, partitioning, merge-tree shape and
  * replayed duplicates cannot change which k hashes are smallest
  * (the [[Kmv]] determinism argument, carried to pairs). Merge
  * invariance is therefore EXACT array equality, and any rollup tree
  * (per-day sketches unioned into per-type) lands on the identical
  * retained set — which is what makes pre-sketched daily partitions
  * safe to re-aggregate forever, the property `approx_percentile`'s
  * one-shot result does not have.
  *
  * Quantile estimate: the ⌈q·m⌉-th smallest retained VALUE (discrete,
  * no interpolation — same rank convention as the engine's exact
  * medians). Sampling theory bounds the rank error by ~n·√(q(1−q)/k);
  * the QC queries check the estimate lands inside the exact
  * [q−ε, q+ε] rank band and ship the bound as a 0/1 metric
  * (invariants-as-data — estimates never cross engines).
  *
  * Representation: sorted `array<struct<h: long, v: long>>`; struct
  * sort order is lexicographic, h first, so array_sort/distinct/slice
  * implement the union natively. The bounded buffer is the one typed
  * object agg; every estimator is a native Column.
  */
object BottomK {

  /** Insert into the parallel-array max-heap buffer keyed on flipped
    * hash; values ride along with their hash through every sift. */
  private[graft] def insert(b: (Int, Array[Long], Array[Long]), h: Long,
                            v: Long, k: Int): (Int, Array[Long], Array[Long]) = {
    val (n, hs0, vs0) = b
    if (n == 0 && hs0.isEmpty) {
      val hs = new Array[Long](k); val vs = new Array[Long](k)
      hs(0) = h; vs(0) = v
      return (1, hs, vs)
    }
    val hs = hs0; val vs = vs0
    @inline def swap(a: Int, c: Int): Unit = {
      val th = hs(a); hs(a) = hs(c); hs(c) = th
      val tv = vs(a); vs(a) = vs(c); vs(c) = tv
    }
    if (n < k) {
      var i = 0
      while (i < n) { if (hs(i) == h) return b; i += 1 }
      hs(n) = h; vs(n) = v
      var c = n
      while (c > 0 && hs((c - 1) / 2) < hs(c)) {
        val p = (c - 1) / 2; swap(p, c); c = p
      }
      (n + 1, hs, vs)
    } else if (h < hs(0)) {
      var i = 0
      while (i < n) { if (hs(i) == h) return b; i += 1 }
      hs(0) = h; vs(0) = v
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < k && hs(l) > hs(m)) m = l
        if (r < k && hs(r) > hs(m)) m = r
        if (m == c) done = true else { swap(m, c); c = m }
      }
      b
    } else b
  }

  final case class Entry(h: Long, v: Long)

  /** Input rows are (rawHash, value); the Aggregator flips the hash so
    * signed order is uniform-smallest (the [[Kmv.flip]] trick). */
  final class BottomKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), (Int, Array[Long], Array[Long]), Array[Entry]] {
    require(k >= 2, "k >= 2")

    def zero: (Int, Array[Long], Array[Long]) =
      (0, Array.emptyLongArray, Array.emptyLongArray)

    def reduce(b: (Int, Array[Long], Array[Long]),
               in: (Long, Long)): (Int, Array[Long], Array[Long]) =
      insert(b, in._1 ^ Long.MinValue, in._2, k)

    def merge(l: (Int, Array[Long], Array[Long]),
              r: (Int, Array[Long], Array[Long])): (Int, Array[Long], Array[Long]) = {
      var acc = l
      var i = 0
      while (i < r._1) { acc = insert(acc, r._2(i), r._3(i), k); i += 1 }
      acc
    }

    def finish(b: (Int, Array[Long], Array[Long])): Array[Entry] = {
      val out = (0 until b._1).map(i => Entry(b._2(i), b._3(i))).toArray
      out.sortBy(_.h)
    }

    def bufferEncoder: org.apache.spark.sql.Encoder[(Int, Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Array[Long], Array[Long])]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Entry]]()
  }

  /** Discrete q-quantile of the retained values: the ⌈q·m⌉-th smallest
    * (rank clamps to ≥1). Native columns end to end. */
  def quantile(sk: Column, q: Double): Column = {
    val vals = array_sort(transform(sk, e => e.getField("v")))
    val rank = greatest(lit(1), ceil(size(sk) * lit(q)).cast("int"))
    element_at(vals, rank)
  }

  /** Union as a plain Column: k smallest distinct (h, v) structs of
    * the concatenation — struct order is (h, v) lexicographic, so this
    * IS bottom-k by hash. Rollup along any hierarchy.
    *
    * CAUTION at scale: `array_distinct` over STRUCT elements is
    * pairwise O(n²) with an interpreted comparator (unlike its hashed
    * primitive path) — measured 13 s on 5×15k-element unions. Use this
    * form only when inputs can genuinely share elements (at-least-once
    * re-delivery across sketch snapshots); for partition rollups use
    * [[unionDisjoint]]. */
  def unionAll(sks: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(sks))), 1, k)

  /** Union of sketches over DISJOINT inputs (day partitions, shards):
    * a row identity lives in exactly one partition, so no (h, v) pair
    * can repeat across inputs and the distinct pass is pure waste —
    * flatten + sort + slice is linearithmic. */
  def unionDisjoint(sks: Column, k: Int): Column =
    slice(array_sort(flatten(sks)), 1, k)
}
