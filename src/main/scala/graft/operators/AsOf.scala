package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2 as-of snapshot selection (SURVEY §2.4): each dataset file is a
  * slowly-changing-dimension snapshot valid from its date until the
  * next one; a query dated d uses the latest snapshot ≤ d, clamped to
  * the earliest snapshot when d precedes them all
  * (directory.go:120-131,221-240; legacy-dataset.go:56-57).
  */
object AsOf {
  val EffFrom = "eff_from"
  val EffTo = "eff_to"

  /** SCD-2 interval construction: adds [eff_from, eff_to) via lead()
    * over the snapshot dates. With `clamp` (the default, matching the
    * reference's earliest-snapshot rule) the earliest snapshot gets a
    * NULL eff_from (open start); with `clamp=false` intervals start at
    * their own date, so facts earlier than every snapshot match
    * nothing — the strict `snapshot_date <= fact_date` as-of. The
    * latest snapshot always gets a NULL eff_to (open end).
    */
  def withIntervals(snapshots: DataFrame, dateCol: String,
      keyCols: Seq[String] = Nil, clamp: Boolean = true): DataFrame = {
    val w =
      if (keyCols.nonEmpty)
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(dateCol))
      else Window.partitionBy().orderBy(col(dateCol))
    val from =
      if (clamp)
        when(row_number().over(w) === 1, lit(null).cast(
          snapshots.schema(dateCol).dataType))
          .otherwise(col(dateCol))
      else col(dateCol)
    snapshots
      .withColumn(EffFrom, from)
      .withColumn(EffTo, lead(col(dateCol), 1).over(w))
  }

  /** Left-join each fact row to its as-of snapshot; exactly one
    * interval matches per fact row.
    *
    * Join strategy: an UNKEYED snapshot side is a dataset directory
    * (tens to hundreds of rows) and is force-broadcast — without the
    * hint its interval-only condition would plan as a BNLJ. A KEYED
    * snapshot side scales with the key domain (per-user SCD history
    * can be corpus-sized at 100 TB), so the equi-key lets Catalyst/
    * AQE pick from stats: broadcast while it fits, shuffled hash join
    * once it doesn't — never forced into an over-broadcast.
    */
  def asOfSnapshot(facts: DataFrame, snapshots: DataFrame,
      factDate: Column, dateCol: String,
      keyCols: Seq[String] = Nil, joinType: String = "left",
      clamp: Boolean = true): DataFrame = {
    val snap = withIntervals(snapshots, dateCol, keyCols, clamp)
    val interval = (col(EffFrom).isNull || factDate >= col(EffFrom)) &&
      (col(EffTo).isNull || factDate < col(EffTo))
    val cond = keyCols.foldLeft(interval)((c, k) =>
      c && facts(k) === snap(k))
    val snapSide = if (keyCols.isEmpty) broadcast(snap) else snap
    val joined = facts.join(snapSide, cond, joinType)
      .drop(EffFrom, EffTo)
    keyCols.foldLeft(joined)((df, k) => df.drop(snap(k)))
  }

  /** J2 merge-based as-of — the large×large scale path. Instead of
    * joining facts to snapshot intervals (asOfSnapshot — right-sized
    * when the snapshot side is a dataset directory or broadcastable
    * SCD table), both sides are unioned onto one per-key timeline and
    * a single incremental window pass carries the running latest
    * snapshot row forward onto each fact:
    *
    *   - one shuffle (hash on keyCols) + one sort — no join operator,
    *     no broadcast of either side, no expanded intermediate: the
    *     frame [unboundedPreceding, currentRow] makes Spark's
    *     WindowExec update `last` incrementally, O(rows) per
    *     partition;
    *   - snapshot payload travels as ONE struct so the matched columns
    *     always come from the same snapshot row (per-column
    *     last(ignoreNulls) could stitch columns from different rows
    *     when a snapshot holds genuine NULLs).
    *
    * Inclusive semantics `snapshot_date <= fact_time` (the tie-break
    * sorts snapshots before facts at equal time). By default strict
    * (non-clamped): a fact earlier than every snapshot of its key
    * matches nothing — dropped when `joinType="inner"`, NULL payload
    * when `"left"`. With `clamp=true` (the reference's
    * earliest-snapshot rule, directory.go:230-240, per key) such a
    * fact takes its key's EARLIEST snapshot instead — one extra
    * unbounded-frame `first` over the same window sort, still no
    * join. NULL-keyed snapshots are discarded and NULL-keyed facts
    * never match, mirroring SQL equi-join NULL semantics.
    *
    * Caller aligns types: `factTime` must be the same data type as
    * `snapshots(dateCol)`. Among duplicate (key, date) snapshot rows
    * the picked row is arbitrary — dedup first if payloads differ.
    */
  def asOfMerge(facts: DataFrame, snapshots: DataFrame, factTime: Column,
      dateCol: String, keyCols: Seq[String],
      joinType: String = "inner", clamp: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asOfMerge needs at least one key column")
    require(joinType == "inner" || joinType == "left",
      s"asOfMerge supports inner/left, got $joinType")
    val t = "__asof_t"; val typ = "__asof_typ"; val pay = "__asof_snap"
    val factCols = facts.columns.toSeq
    val snapPayload =
      snapshots.columns.toSeq.filterNot(keyCols.contains)
    require(factCols.intersect(snapPayload).isEmpty,
      s"fact/snapshot column collision: ${factCols.intersect(snapPayload)}")
    val factPayload = factCols.filterNot(keyCols.contains)
    val payStruct = struct(snapPayload.map(col): _*)
    val sSide = snapshots
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++ Seq(col(dateCol).as(t),
        lit(0).as(typ), payStruct.as(pay)) ++
        factPayload.map(c =>
          lit(null).cast(facts.schema(c).dataType).as(c)): _*)
    val fSide = facts
      .select(keyCols.map(col) ++ Seq(factTime.as(t),
        lit(1).as(typ), lit(null).cast(sSide.schema(pay).dataType)
          .as(pay)) ++ factPayload.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t), col(typ))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val running = last(col(pay), ignoreNulls = true).over(w)
    val resolved =
      if (!clamp) running
      else {
        // earliest snapshot of the key: first non-null payload over
        // the full partition (same partitioning + sort → one
        // WindowExec computes both frames, still zero joins)
        val wAll = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(t), col(typ))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        coalesce(running, first(col(pay), ignoreNulls = true).over(wAll))
      }
    val merged = sSide.unionByName(fSide)
      .withColumn(pay, resolved)
      .filter(col(typ) === 1 &&
        (if (joinType == "inner") col(pay).isNotNull else lit(true)))
    merged.select(keyCols.map(col) ++ factPayload.map(col) ++
      snapPayload.map(c => col(pay).getField(c).as(c)): _*)
  }

  /** J9 date-aligned merge (directory.go:141-202): build the unified
    * date spine across several snapshot lists and as-of join each
    * list back onto it — one row per unique date holding, per list,
    * the latest snapshot ≤ that date.
    *
    * Each input must expose `dateCol` plus list-unique payload
    * columns.
    */
  def alignSnapshots(lists: Seq[DataFrame], dateCol: String): DataFrame = {
    require(lists.nonEmpty)
    val spine = lists
      .map(_.select(col(dateCol)))
      .reduce(_.unionByName(_))
      .distinct()
    lists.zipWithIndex.foldLeft(spine) { case (acc, (l, i)) =>
      val renamed = l.withColumnRenamed(dateCol, s"__d$i")
      asOfSnapshot(acc, renamed, acc(dateCol), s"__d$i")
        .drop(s"__d$i")
    }
  }
}
