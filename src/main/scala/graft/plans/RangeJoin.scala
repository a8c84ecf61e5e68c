package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Whole-operator Catalyst integration for point-in-range joins
  * (SURVEY §4: the escalation beyond the broadcast binary-search
  * *expression*): a planner strategy that recognizes
  *
  *   facts JOIN ranges ON ip >= lo AND ip <= hi
  *
  * with a broadcastable `ranges` side and plans a broadcast
  * sorted-interval join instead of Spark's BroadcastNestedLoopJoin.
  *
  * Physical algorithm: collect + sort ranges by `lo`, precompute the
  * running max of `hi`; each probe binary-searches the last range
  * with lo ≤ ip, then walks back while the prefix max-hi can still
  * cover ip. O(log n + k) per probe for k matches — O(log n) on the
  * disjoint tables the annotation pipeline produces — and correct
  * for arbitrary overlapping intervals (the prefix max bounds the
  * walk-back). The fact side streams: no shuffle, no BNLJ, and the
  * 100 TB scan shape is one broadcast fetch per executor.
  *
  * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`;
  * declared query q07 exercises it end-to-end against the DuckDB
  * oracle with no query change.
  */
object RangeJoinPattern {
  /** (facts, ranges, ip, lo, hi, loStrict, hiStrict, rest, joinType,
    * rangesOnRight)
    */
  type Match = (LogicalPlan, LogicalPlan, Expression, Expression, Expression,
    Boolean, Boolean, Seq[Expression], JoinType, Boolean)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** A bound like `ip >= lo` in any written orientation. The range
    * side may be any expression over the ranges relation (e.g. a
    * Cast the analyzer inserted), evaluated once at build time.
    */
  private case class Bound(ip: Expression, rangeExpr: Expression,
    isLower: Boolean, strict: Boolean)

  private def asBound(e: Expression, rangeSide: LogicalPlan,
      factSide: LogicalPlan): Option[Bound] = {
    def splits(ip: Expression, r: Expression): Option[(Expression, Expression)] =
      if (r.references.nonEmpty &&
        r.references.subsetOf(rangeSide.outputSet) &&
        r.deterministic &&
        ip.references.subsetOf(factSide.outputSet) &&
        ip.references.nonEmpty && ip.deterministic) Some((ip, r))
      else None
    e match {
      case GreaterThanOrEqual(l, r) => // ip >= lo
        splits(l, r).map { case (ip, a) => Bound(ip, a, isLower = true,
          strict = false) }
          .orElse(splits(r, l).map { case (ip, a) =>
            Bound(ip, a, isLower = false, strict = false) }) // hi >= ip
      case GreaterThan(l, r) =>
        splits(l, r).map { case (ip, a) => Bound(ip, a, isLower = true,
          strict = true) }
          .orElse(splits(r, l).map { case (ip, a) =>
            Bound(ip, a, isLower = false, strict = true) })
      case LessThanOrEqual(l, r) => // ip <= hi
        splits(l, r).map { case (ip, a) => Bound(ip, a, isLower = false,
          strict = false) }
          .orElse(splits(r, l).map { case (ip, a) =>
            Bound(ip, a, isLower = true, strict = false) })
      case LessThan(l, r) =>
        splits(l, r).map { case (ip, a) => Bound(ip, a, isLower = false,
          strict = true) }
          .orElse(splits(r, l).map { case (ip, a) =>
            Bound(ip, a, isLower = true, strict = true) })
      case _ => None
    }
  }

  def unapply(plan: LogicalPlan): Option[Match] = plan match {
    case Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), _) =>
      val cs = conjuncts(cond)
      def tryMatch(ranges: LogicalPlan, facts: LogicalPlan,
          rangesOnRight: Boolean): Option[Match] = {
        // LeftOuter requires the ranges on the build (right) side
        if (joinType == LeftOuter && !rangesOnRight) return None
        val bounds = cs.map(c => c -> asBound(c, ranges, facts))
        val lower = bounds.collectFirst {
          case (c, Some(b)) if b.isLower => (c, b) }
        val upper = bounds.collectFirst {
          case (c, Some(b)) if !b.isLower => (c, b) }
        (lower, upper) match {
          case (Some((cl, bl)), Some((cu, bu)))
            if bl.ip.semanticEquals(bu.ip) &&
              RowOrdering.isOrderable(bl.ip.dataType) &&
              !bl.rangeExpr.semanticEquals(bu.rangeExpr) =>
            val rest = cs.filterNot(c => (c eq cl) || (c eq cu))
            Some((facts, ranges, bl.ip, bl.rangeExpr, bu.rangeExpr,
              bl.strict, bu.strict, rest, joinType, rangesOnRight))
          case _ => None
        }
      }
      tryMatch(right, left, rangesOnRight = true)
        .orElse(tryMatch(left, right, rangesOnRight = false))
    case _ => None
  }
}

/** Broadcast sorted-interval join exec. `left` = facts (streamed),
  * `right` = ranges (collected, sorted, broadcast).
  */
case class BroadcastRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    ipExpr: Expression, loExpr: Expression, hiExpr: Expression,
    loStrict: Boolean, hiStrict: Boolean,
    extraCond: Option[Expression], joinType: JoinType,
    factsOutput: Seq[Attribute], rangesOutput: Seq[Attribute],
    rangesOnRight: Boolean)
  extends BinaryExecNode {

  // the fact (left) side streams through unchanged — advertise its
  // partitioning/ordering so downstream operators don't re-shuffle
  // (same contract BroadcastHashJoinExec provides)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter =>
      (if (rangesOnRight) factsOutput ++ rangesOutput.map(_.withNullability(true))
      else rangesOutput.map(_.withNullability(true)) ++ factsOutput)
    case _ => if (rangesOnRight) factsOutput ++ rangesOutput
      else rangesOutput ++ factsOutput
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val dt: DataType = ipExpr.dataType
    val ordering = TypeUtils.getInterpretedOrdering(dt)
    val boundLo = BindReferences.bindReference(loExpr, rangesOutput)
    val boundHi = BindReferences.bindReference(hiExpr, rangesOutput)

    val collected = right.executeCollect() // ranges side, broadcast scale
    val keyed = collected.map(r => (r, boundLo.eval(r), boundHi.eval(r)))
    val sorted = keyed.sortWith { (a, b) =>
      if (a._2 == null) false
      else if (b._2 == null) true
      else ordering.lt(a._2, b._2)
    }
    val n = sorted.length
    val rows = new Array[InternalRow](n)
    val los = new Array[Any](n)
    val his = new Array[Any](n)
    val maxHi = new Array[Any](n)
    var i = 0
    var runMax: Any = null
    while (i < n) {
      rows(i) = sorted(i)._1
      los(i) = sorted(i)._2
      his(i) = sorted(i)._3
      if (his(i) != null && (runMax == null || ordering.gt(his(i), runMax)))
        runMax = his(i)
      maxHi(i) = runMax
      i += 1
    }
    val bc = sparkContext.broadcast((rows, los, his, maxHi))

    val boundIp = BindReferences.bindReference(ipExpr, factsOutput)
    val joinedInput =
      if (rangesOnRight) factsOutput ++ rangesOutput
      else rangesOutput ++ factsOutput
    val boundExtra = extraCond.map(BindReferences.bindReference(_, joinedInput))
    val numOutputRows = longMetric("numOutputRows")

    left.execute().mapPartitions { iter =>
      val (ranges, lo, hi, mh) = bc.value
      val m = ranges.length
      val joined = new JoinedRow
      val nullRange = new GenericInternalRow(rangesOutput.length)
      val resultProj = UnsafeProjection.create(output, output)

      def lastLoLeq(ip: Any): Int = {
        // greatest j with lo(j) <= ip (or < for strict lower bound
        // meaning ip > lo)
        var s = 0; var e = m - 1; var ans = -1
        while (s <= e) {
          val mid = (s + e) >>> 1
          val l = lo(mid)
          val ok = l != null &&
            (if (loStrict) ordering.lt(l, ip) else ordering.lteq(l, ip))
          if (ok) { ans = mid; s = mid + 1 } else e = mid - 1
        }
        ans
      }

      iter.flatMap { factRow =>
        val ip = boundIp.eval(factRow)
        var emitted = 0
        val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
        if (ip != null && m > 0) {
          var j = lastLoLeq(ip)
          // walk back while some range in the prefix may still cover ip
          while (j >= 0 && mh(j) != null &&
              (if (hiStrict) ordering.gt(mh(j), ip)
              else ordering.gteq(mh(j), ip))) {
            val h = hi(j)
            val covers = h != null &&
              (if (hiStrict) ordering.lt(ip, h) else ordering.lteq(ip, h))
            if (covers) {
              val jr = if (rangesOnRight) joined(factRow, ranges(j))
                else joined(ranges(j), factRow)
              if (boundExtra.forall(_.eval(jr) == true)) {
                out += resultProj(jr).copy()
                emitted += 1
              }
            }
            j -= 1
          }
        }
        if (emitted == 0 && joinType == LeftOuter) {
          out += resultProj(joined(factRow, nullRange)).copy()
        }
        numOutputRows += out.length
        out.iterator
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: fire only when the ranges side is under the
  * broadcast threshold (same knob Spark's own broadcast joins use).
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPattern(facts, ranges, ip, lo, hi, loStrict, hiStrict,
        rest, joinType, rangesOnRight) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      val small = threshold > 0 && ranges.stats.sizeInBytes <= threshold
      if (!small) Nil
      else {
        val extra = rest.reduceOption(And)
        BroadcastRangeJoinExec(planLater(facts), planLater(ranges),
          ip, lo, hi, loStrict, hiStrict, extra, joinType,
          facts.output, ranges.output, rangesOnRight) :: Nil
      }
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
  }
}
