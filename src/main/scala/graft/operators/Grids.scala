package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-spine guard for grid windows. The hour/day-grid queries run
  * unpartitioned windows over `sequence(min_bucket, max_bucket)` —
  * defensible ONLY because the grid is calendar-bounded, not
  * data-bounded. That argument silently breaks if the bucket unit
  * shrinks (seconds) or the time span explodes (a misparsed epoch in
  * one row widens min..max by decades); this guard turns the monster
  * grid into a fast in-plan failure at the 1-row spine aggregate,
  * before the explode materializes anything.
  */
object Grids {
  /** Ceiling for a single-task dense grid: ~114 years of hours, or
    * 2.7 millennia of days — generous for any calendar span, far
    * below what an unpartitioned window can absorb before it hurts.
    */
  val MaxGridCells = 1000000L

  /** `sequence(lo, hi)` that raises in-plan when the span exceeds
    * `maxCells` (message carries `what` and the offending span).
    * Evaluated on the 1-row (lo, hi) aggregate — zero extra jobs.
    */
  def boundedSpine(lo: Column, hi: Column,
      maxCells: Long = MaxGridCells, what: String = "grid"): Column = {
    val span = hi - lo + lit(1L)
    // Null bounds (empty input feeding the min/max aggregate) must
    // pass through: sequence(null, hi) is null, explode drops it, the
    // grid is empty — not an in-plan raise with a null-ish message.
    val guardedLo = when(lo.isNull || hi.isNull || span <= lit(maxCells),
        lo)
      .otherwise(raise_error(concat(
        lit(s"$what spine exceeds $maxCells cells: span="),
        span.cast("string"))).cast("long"))
    sequence(guardedLo, hi)
  }
}
