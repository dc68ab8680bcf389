package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding — the multi-dimensional clustering
  * key lakehouse table formats sort data files by, so that a filter
  * on EITHER dimension prunes files via min/max statistics (a 1-D
  * sort gives perfect pruning on its own column and none on any
  * other; the Z curve trades a little of each for useful bounds on
  * all). The encoding is a static 8-term-per-dimension fold of
  * shift/mask/scale Columns — whole-stage-codegen'd arithmetic, no
  * UDF, and bit-identical to the oracle's unrolled SQL sum.
  *
  * Dimensions are RANGE-QUANTIZED to `bits` (default 8) before
  * interleaving, the same move production z-order implementations
  * make: raw values share constant high bits (every day of one month,
  * every id of one tenant), which would waste curve resolution;
  * quantizing each dimension to its observed [min, max] spends every
  * curve bit on actual spread. */
object ZOrder {

  /** Interleave two quantized dimensions (each in [0, 2^bits)) into
    * a Morton code: x takes even bit positions, y odd. Quantization
    * itself is plain `((v - min) * 2^bits) div (span + 1)` integer
    * arithmetic at the call site — engines agree exactly. */
  def interleave(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
}
