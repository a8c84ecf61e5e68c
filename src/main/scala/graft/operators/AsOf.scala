package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    *
    * ==Hot-key guard (default ON)==
    * A per-key window funnels each key's ENTIRE timeline into one
    * task's sort, and WindowExec cannot skew-split the way AQE splits
    * joins — one monster key (10⁸ events at 100 TB) is a single-task
    * cliff. With `maxKeyRows > 0` the merge guards itself:
    *
    *   1. one skew-safe aggregate (count/min/max per key — map-side
    *      combined, so the hot key itself cannot skew it) finds keys
    *      whose timeline exceeds `maxKeyRows`; the flagged table is
    *      bounded by totalRows/maxKeyRows and is broadcast back as a
    *      tag (in practice: the handful of monster keys);
    *   2. ONE unified (key, slice) window serves every key: cold keys
    *      take slice 0 — their (key, 0) partition is exactly the
    *      plain per-key window — while hot keys are sub-partitioned
    *      by a coarse time slice (`ceil(4·n/maxKeyRows)` slices,
    *      capped at [[MaxSlices]], so expected rows/slice ≈
    *      maxKeyRows/4) for bounded task input;
    *   3. a per-slice closing-snapshot summary carries the boundary
    *      snapshot across slices. It is computed from the SNAPSHOT
    *      side alone (facts carry NULL payloads and every payload
    *      frame is ignoreNulls, so close/open are functions of the
    *      snapshots) over a DENSE slice spine exploded from the
    *      broadcast-size flagged table (≤ #hotKeys × MaxSlices rows),
    *      then LEFT-joined back on (key, slice) — a dense equi-key
    *      the hot key no longer dominates, an empty (AQE-broadcast)
    *      side when no key is hot. The shape matters: facts feed ONE
    *      window and are scanned exactly twice (pruned detection +
    *      full merge); two earlier shapes — cold/hot branches, and a
    *      summary derived from the window's own output — re-scanned
    *      the timeline up to four times (column pruning defeats
    *      ReuseExchange) and measured ~2.3× on q08.
    *
    * A hot key whose rows all share ONE instant cannot be time-sliced;
    * such rows are hash-spread across slices and every fact takes the
    * key's closing snapshot — at a single instant all snapshots tie,
    * so this is the documented arbitrary-among-duplicates pick.
    * Results are identical to the unguarded merge (slice boundaries
    * respect the time order, and the within-slice sort keeps the
    * snapshot-before-fact tie-break); only the physical plan changes.
    * The guard needs a numeric image of the time axis and supports
    * date / timestamp / timestamp_ntz / numeric `factTime`; for any
    * other type (or `maxKeyRows <= 0`) the merge falls back to the
    * unguarded single-window plan.
    */
  def asOfMerge(facts: DataFrame, snapshots: DataFrame, factTime: Column,
      dateCol: String, keyCols: Seq[String],
      joinType: String = "inner", clamp: Boolean = false,
      maxKeyRows: Int = DefaultMaxKeyRows): DataFrame = {
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
    val timeline = sSide.unionByName(fSide)
    val timeNum = numericTime(col(t), timeline.schema(t).dataType)

    // running latest-snapshot payload via one window pass over `df`
    // (which must hold the timeline columns); partitions on partCols
    def resolveRunning(df: DataFrame, partCols: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(partCols: _*)
        .orderBy(col(t), col(typ))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val running = last(col(pay), ignoreNulls = true).over(w)
      val resolved =
        if (!clamp) running
        else {
          // earliest snapshot of the partition: first non-null payload
          // over the full frame (same partitioning + sort → one
          // WindowExec computes both frames, still zero joins)
          val wAll = Window.partitionBy(partCols: _*)
            .orderBy(col(t), col(typ))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)
          coalesce(running, first(col(pay), ignoreNulls = true).over(wAll))
        }
      df.withColumn(pay, resolved)
    }

    val outCols = keyCols.map(col) ++ Seq(col(typ), col(pay)) ++
      factPayload.map(col)
    val merged =
      if (maxKeyRows <= 0 || timeNum.isEmpty)
        resolveRunning(timeline, keyCols.map(col)).select(outCols: _*)
      else {
        val n = "__asof_n"; val lo = "__asof_lo"; val hi = "__asof_hi"
        val sliceC = "__asof_slice"
        // skew-safe detection: partial count/min/max combine map-side,
        // so the monster key contributes one row per input partition.
        // min/max run on the RAW time type (natively orderable) — the
        // numeric conversion (4 chrono calls for timestamp_ntz) runs
        // on the two boundary values per key, never per detection row
        val hotStats = timeline
          .select(keyCols.map(col) :+ col(t): _*)
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as(n), min(col(t)).as(lo),
            max(col(t)).as(hi))
          .filter(col(n) > maxKeyRows)
        // Eager bounded probe (take-1 over the flagged-key table: one
        // key+time-pruned scan, map-side-combined agg). When NO key is
        // hot — the overwhelmingly common case — the merge keeps the
        // plain single-window plan and pays only this probe, instead
        // of dragging the tag join + slice assignment + summary/spine
        // machinery through every run (measured ~2× on q08/q26 at
        // sf0.1). The probe makes this builder EAGER (it runs one
        // bounded Spark job at construction time); every call site is
        // batch, and the job is a pruned scan + partial agg, parallel
        // and key-skew-immune at any scale.
        if (hotStats.isEmpty)
          resolveRunning(timeline, keyCols.map(col)).select(outCols: _*)
        else mergedGuarded(timeline, hotStats, timeNum.get, keyCols,
          factPayload, clamp, maxKeyRows,
          t, typ, pay, n, lo, hi, sliceC, outCols)
      }
    merged
      .filter(col(typ) === 1 &&
        (if (joinType == "inner") col(pay).isNotNull else lit(true)))
      .select(keyCols.map(col) ++ factPayload.map(col) ++
        snapPayload.map(c => col(pay).getField(c).as(c)): _*)
  }

  /** The sliced plan for timelines that DO hold a hot key — see the
    * hot-key-guard scaladoc on [[asOfMerge]]. Split out so the common
    * no-hot-key path stays a one-window plan.
    */
  private def mergedGuarded(timeline: DataFrame, hotStats: DataFrame,
      timeNumC: Column, keyCols: Seq[String], factPayload: Seq[String],
      clamp: Boolean, maxKeyRows: Int,
      t: String, typ: String, pay: String, n: String, lo: String,
      hi: String, sliceC: String, outCols: Seq[Column]): DataFrame = {
        val tType = timeline.schema(t).dataType
        val loN = numericTime(col(lo), tType).get
        val hiN = numericTime(col(hi), tType).get
        // flagged-key table ≤ totalRows/maxKeyRows rows by construction
        val tagged = timeline.join(broadcast(hotStats),
          keyCols, "left")
        // UNIFIED plan — no cold/hot branches: cold keys take slice 0
        // (their (key, 0) window ≡ the plain per-key window), hot keys
        // their computed time slice. ONE WindowExec over the big
        // timeline serves everyone; facts are scanned exactly twice —
        // once pruned to (key, time) for detection, once full for the
        // merge. (Two earlier shapes did worse, both measured ~2.3×
        // on q08: cold/hot branches re-scanned the timeline per
        // branch, and deriving the carry summary from the window's
        // own output re-planned the whole pipeline again under the
        // join because column pruning defeats ReuseExchange.)
        val nSlices = least(ceil(col(n) * SliceOversample /
          lit(maxKeyRows.toDouble)), lit(MaxSlices.toLong))
        val degenerate = col(hi) === col(lo)
        val slice = when(col(n).isNull, lit(0))
          .when(degenerate,
            // single-instant key: ordering is immaterial (every
            // snapshot ties), spread rows by hash to bound the sort
            pmod(xxhash64(Seq(col(t), col(typ)) ++
              factPayload.map(col): _*), nSlices))
          .otherwise(least(
            floor((timeNumC - loN) /
              ((hiN - loN) / nSlices)), nSlices - 1))
          .cast(IntegerType)
        // bounded per-task window: partition spec is (key, slice);
        // with clamp, the key-earliest payload for COLD keys rides in
        // the SAME WindowExec as the running-last (full frame — their
        // (key, 0) partition spans the whole key)
        val hw = Window.partitionBy((keyCols :+ sliceC).map(col): _*)
          .orderBy(col(t), col(typ))
        val run0 = tagged.withColumn(sliceC, slice)
          .withColumn("__asof_run",
            last(col(pay), ignoreNulls = true)
              .over(hw.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)))
        val run =
          if (!clamp) run0
          else run0.withColumn("__asof_open",
            first(col(pay), ignoreNulls = true)
              .over(hw.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
        // Cross-slice carry for HOT keys, from the SNAPSHOT side
        // alone: facts carry NULL payloads and every payload frame is
        // ignoreNulls, so per-slice closing/opening snapshots are a
        // function of the snapshots — the big fact stream never feeds
        // the summary. Snapshot rows of hot keys get the same slice
        // assignment, a (key, slice) window pins close/open (window
        // frames, not struct aggregates — those would plan
        // SortAggregates), distinct() collapses to one row per slice.
        val ssw = Window.partitionBy((keyCols :+ sliceC).map(col): _*)
          .orderBy(col(t), col(typ))
        // snapshot side of the timeline (typ 0); facts never feed here
        val perSlice = timeline.filter(col(typ) === 0)
          .join(broadcast(hotStats), keyCols)
          .withColumn(sliceC, slice)
          .withColumn("__asof_close",
            last(col(pay), ignoreNulls = true)
              .over(ssw.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
          .withColumn("__asof_open",
            first(col(pay), ignoreNulls = true)
              .over(ssw.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
          .select((keyCols :+ sliceC).map(col) ++
            Seq(col("__asof_close"), col("__asof_open")): _*)
          .distinct()
        // DENSE slice spine per hot key (exploded from the broadcast-
        // size flagged table): slices holding only facts still need a
        // carry row, else a snapshot-free slice would lose its
        // boundary. ≤ #hotKeys × MaxSlices rows; the per-key carry
        // window runs over exactly nSlices rows per key.
        val spine = hotStats.select(keyCols.map(col) :+
          explode(sequence(lit(0),
            (nSlices - 1).cast(IntegerType))).as(sliceC): _*)
        val sw = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(sliceC))
        val summary = spine.join(perSlice, keyCols :+ sliceC, "left")
          .withColumn("__asof_carry",
            last("__asof_close", ignoreNulls = true)
              .over(sw.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("__asof_keyclose",
            last("__asof_close", ignoreNulls = true)
              .over(sw.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
          .withColumn("__asof_keyopen",
            first("__asof_open", ignoreNulls = true)
              .over(sw.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)))
          .select((keyCols :+ sliceC).map(col) ++
            Seq(col("__asof_carry"), col("__asof_keyclose"),
              col("__asof_keyopen")): _*)
        // dense (key, slice) LEFT equi-join against the hot-only
        // summary (empty when data is well-behaved — AQE broadcasts
        // it); the hot key no longer dominates any one hash bucket
        val joined = run.join(summary, keyCols :+ sliceC, "left")
        // cold rows: carry/keyclose/keyopen are NULL from the left
        // join; base reduces to the running-last and the clamp falls
        // back to the row's own full-frame `open` (its (key, 0)
        // window spans the whole key — exactly the unguarded clamp)
        val base = when(col(n).isNotNull && degenerate,
            col("__asof_keyclose"))
          .otherwise(coalesce(col("__asof_run"), col("__asof_carry")))
        val resolved =
          if (clamp) coalesce(base,
            when(col(n).isNull, col("__asof_open"))
              .otherwise(col("__asof_keyopen")))
          else base
        joined.withColumn(pay, resolved).select(outCols: _*)
  }

  /** Hot-key guard threshold: keys with more timeline rows than this
    * are time-sliced (~10⁶ — well inside one task's sort budget but
    * far above any legitimate per-key cardinality in the reference's
    * workloads).
    */
  val DefaultMaxKeyRows: Int = 1 << 20
  /** Target rows/slice = maxKeyRows / oversample — headroom for
    * time-nonuniform keys.
    */
  private val SliceOversample = 4
  /** Slice-count cap: bounds the per-key summary table (and its carry
    * window) regardless of key size.
    */
  private val MaxSlices = 4096

  /** Monotone (nondecreasing) numeric image of the timeline axis for
    * slice bucketing; None when the type has no order-preserving
    * numeric form (guard then falls back to the unguarded plan).
    * timestamp_ntz avoids a session-TZ cast (a DST gap would break
    * monotonicity) by composing epoch-day and time-of-day directly.
    */
  private def numericTime(c: Column, dt: DataType): Option[Column] =
    dt match {
      case DateType => Some(unix_date(c).cast(DoubleType))
      case TimestampType => Some(unix_micros(c).cast(DoubleType))
      case TimestampNTZType =>
        Some(unix_date(c.cast(DateType)).cast(DoubleType) * 86400d +
          hour(c) * 3600d + minute(c) * 60d + second(c))
      case _: NumericType => Some(c.cast(DoubleType))
      case _ => None
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

  /** Nearest-in-time as-of join: each fact takes its key's closest
    * snapshot in EITHER direction (ties — equidistant backward and
    * forward candidates — take the backward, i.e. earlier, snapshot).
    * The reference's as-of is strictly backward; nearest is the
    * variant a feature pipeline wants when a measurement may be
    * logged just after the fact it describes.
    *
    * Built by composing two guarded [[asOfMerge]] passes — backward
    * (latest snapshot <= fact) and forward (earliest snapshot >=
    * fact, which IS the backward merge on the negated time axis) —
    * so both passes inherit the hot-key time-slice guard for free.
    * The two passes are re-aligned with one equi-join on `factId`
    * (must be unique per fact row), then each snapshot payload column
    * resolves to the nearer side's value. Three shuffles total
    * (merge, merge, id join), no window over an unbounded frame
    * beyond what asOfMerge already does, no cross product.
    *
    * `factTime` and `snapshots(dateCol)` must be numeric (e.g. epoch
    * micros as LONG) — negation needs an arithmetic axis. The output
    * holds every fact column, every snapshot payload column (nearest
    * side), and `asof_dir` ('b' backward / 'f' forward / NULL when
    * the key has no snapshot at all).
    */
  def asOfNearest(facts: DataFrame, snapshots: DataFrame,
      factTime: Column, dateCol: String, keyCols: Seq[String],
      factId: String,
      maxKeyRows: Int = DefaultMaxKeyRows): DataFrame = {
    require(snapshots.schema(dateCol).dataType.isInstanceOf[NumericType],
      s"asOfNearest needs a numeric $dateCol (epoch units); " +
        s"got ${snapshots.schema(dateCol).dataType}")
    val snapPayload =
      snapshots.columns.toSeq.filterNot(keyCols.contains)
    val back = asOfMerge(facts, snapshots, factTime, dateCol, keyCols,
        joinType = "left", clamp = false, maxKeyRows = maxKeyRows)
      .select(facts.columns.map(col) ++
        snapPayload.map(c => col(c).as(s"__b_$c")): _*)
    // forward pass: negate both time axes, then restore the sign on
    // the returned date column
    val negSnap = snapshots.withColumn(dateCol, -col(dateCol))
    val fwd = asOfMerge(facts, negSnap, -factTime, dateCol, keyCols,
        joinType = "left", clamp = false, maxKeyRows = maxKeyRows)
      .withColumn(dateCol, -col(dateCol))
      .select(col(factId) +:
        snapPayload.map(c => col(c).as(s"__f_$c")): _*)
    val bd = col(s"__b_$dateCol"); val fd = col(s"__f_$dateCol")
    val pickBack = fd.isNull ||
      (bd.isNotNull && factTime - bd <= fd - factTime)
    back.join(fwd, factId)
      .select(facts.columns.map(col) ++
        snapPayload.map(c =>
          when(pickBack, col(s"__b_$c")).otherwise(col(s"__f_$c"))
            .as(c)) :+
        when(bd.isNull && fd.isNull, lit(null).cast(StringType))
          .when(pickBack, lit("b")).otherwise(lit("f"))
          .as("asof_dir"): _*)
  }
}
