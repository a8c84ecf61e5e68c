package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data layout.
  *
  * At 100 TB the scan-pruning win comes from LAYOUT, not the plan:
  * parquet row-group min/max pruning only helps when rows predicated
  * on (a, b) are physically clustered in BOTH dimensions. Sorting by
  * the interleaved-bit Morton key before writing gives every file a
  * tight bounding box in each dimension, so predicates on either
  * column (or both) skip most row groups — a single-column sort can
  * only do this for its leading column. `sortWithinPartitions(z)` /
  * `repartitionByRange(z)` before the sink is the intended use.
  *
  * The key is pure bit algebra over built-in column functions — 32
  * shift/mask/or terms, fully inside whole-stage codegen; no UDF, no
  * custom Expression needed.
  */
object ZOrder {

  /** Interleave the low 16 bits of `x` (even positions) and `y` (odd
    * positions) into a 32-bit Morton key. Inputs MUST already be
    * bucketed to [0, 65535] — the caller owns the dimension-to-bucket
    * mapping (quantile or linear), because only the caller knows the
    * value distribution.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** Plain-Scala reference for the parity spec. */
  def interleave16Ref(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }
}
