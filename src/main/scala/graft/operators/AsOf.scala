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
    * over the snapshot dates. The earliest snapshot gets a NULL
    * eff_from (open start — the clamp rule); the latest a NULL eff_to
    * (open end).
    */
  def withIntervals(snapshots: DataFrame, dateCol: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val w =
      if (keyCols.nonEmpty)
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(dateCol))
      else Window.partitionBy().orderBy(col(dateCol))
    snapshots
      .withColumn(EffFrom,
        when(row_number().over(w) === 1, lit(null).cast(
          snapshots.schema(dateCol).dataType))
          .otherwise(col(dateCol)))
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
      keyCols: Seq[String] = Nil, joinType: String = "left"): DataFrame = {
    val snap = withIntervals(snapshots, dateCol, keyCols)
    val interval = (col(EffFrom).isNull || factDate >= col(EffFrom)) &&
      (col(EffTo).isNull || factDate < col(EffTo))
    val cond = keyCols.foldLeft(interval)((c, k) =>
      c && facts(k) === snap(k))
    val snapSide = if (keyCols.isEmpty) broadcast(snap) else snap
    val joined = facts.join(snapSide, cond, joinType)
      .drop(EffFrom, EffTo)
    keyCols.foldLeft(joined)((df, k) => df.drop(snap(k)))
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
