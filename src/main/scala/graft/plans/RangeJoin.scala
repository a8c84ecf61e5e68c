package graft.plans

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.{Partitioner, RangePartitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, JoinHint, LogicalPlan, SHUFFLE_MERGE}
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

/** Shared probe machinery for the sorted-interval join execs: sort
  * ranges by `lo`, attach the prefix running max of `hi`; each probe
  * binary-searches the last range with lo ≤ ip then walks back while
  * the prefix max-hi can still cover ip — O(log n + k) per probe,
  * correct for arbitrary overlapping intervals.
  */
private[plans] object RangeProbe {
  /** (rows sorted by lo, lo, hi, prefix-max-hi). Null-lo rows sort
    * last (they can never match a probe; the walk-back stops on a
    * null prefix max before reaching them).
    */
  def buildArrays(input: Array[InternalRow], boundLo: Expression,
      boundHi: Expression, ordering: Ordering[Any])
      : (Array[InternalRow], Array[Any], Array[Any], Array[Any]) = {
    val keyed = input.map(r => (r, boundLo.eval(r), boundHi.eval(r)))
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
    (rows, los, his, maxHi)
  }
}

/** Executor-local probe index over [[RangeProbe.buildArrays]] output. */
private[plans] final class RangeProbeIndex(
    rows: Array[InternalRow], lo: Array[Any], hi: Array[Any],
    maxHi: Array[Any], ordering: Ordering[Any],
    loStrict: Boolean, hiStrict: Boolean) {
  private val m = rows.length

  /** Greatest j with lo(j) <= ip (< for a strict lower bound). */
  private def lastLoLeq(ip: Any): Int = {
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

  /** Visit every range row covering `ip`, in descending-lo order. */
  def foreachMatch(ip: Any)(f: InternalRow => Unit): Unit = {
    if (ip == null || m == 0) return
    var j = lastLoLeq(ip)
    // walk back while some range in the prefix may still cover ip
    while (j >= 0 && maxHi(j) != null &&
        (if (hiStrict) ordering.gt(maxHi(j), ip)
        else ordering.gteq(maxHi(j), ip))) {
      val h = hi(j)
      val covers = h != null &&
        (if (hiStrict) ordering.lt(ip, h) else ordering.lteq(ip, h))
      if (covers) f(rows(j))
      j -= 1
    }
  }
}

/** Static centered interval tree — the shuffle exec's per-partition
  * probe structure. O(log n + k) point stabbing with NO mixed-width
  * degeneracy: a /8-wide range sharing a partition with thousands of
  * /24s never drags probes into a linear walk (the prefix-max
  * walk-back's worst case — every node-stored interval this query
  * scans is guaranteed covering, so work is exactly matches + depth).
  *
  * Build: center = median endpoint; intervals overlapping the center
  * live at the node (sorted by lo asc AND hi desc), the rest recurse
  * left (hi < center) / right (lo > center). Each level consumes at
  * least the center-owning interval and halves the endpoint set →
  * O(log n) depth, O(n log² n) build on the DIMENSION-scale
  * per-partition range set.
  */
private[plans] final class IntervalTree private (
    root: IntervalTree.Node, ordering: Ordering[Any],
    loStrict: Boolean, hiStrict: Boolean) {

  /** Visit every interval's row covering `ip` (strictness per the
    * join bounds).
    */
  def foreachMatch(ip: Any)(f: InternalRow => Unit): Unit = {
    if (ip == null) return
    var node = root
    while (node != null) {
      val cmp = ordering.compare(ip, node.center)
      if (cmp < 0) {
        // node intervals have hi >= center > ip (strict-hi safe);
        // scan lo-ascending while lo <= ip, strict-lo checked at
        // the boundary
        val lo = node.loAscLo
        val rows = node.loAscRows
        var i = 0
        while (i < lo.length && ordering.lteq(lo(i), ip)) {
          if (!loStrict || ordering.lt(lo(i), ip)) f(rows(i))
          i += 1
        }
        node = node.left
      } else if (cmp > 0) {
        // node intervals have lo <= center < ip (strict-lo safe);
        // scan hi-descending while hi >= ip
        val hi = node.hiDescHi
        val rows = node.hiDescRows
        var i = 0
        while (i < hi.length && ordering.gteq(hi(i), ip)) {
          if (!hiStrict || ordering.gt(hi(i), ip)) f(rows(i))
          i += 1
        }
        node = node.right
      } else {
        // ip == center: every node interval covers it non-strictly;
        // neither subtree can match (left his < ip, right los > ip)
        val lo = node.loAscLo
        val hi = node.loAscHi
        val rows = node.loAscRows
        var i = 0
        while (i < lo.length) {
          if ((!loStrict || ordering.lt(lo(i), ip)) &&
              (!hiStrict || ordering.gt(hi(i), ip))) f(rows(i))
          i += 1
        }
        node = null
      }
    }
  }
}

private[plans] object IntervalTree {
  final class Node(
    val center: Any,
    val loAscLo: Array[Any], val loAscHi: Array[Any],
    val loAscRows: Array[InternalRow],
    val hiDescHi: Array[Any], val hiDescRows: Array[InternalRow],
    val left: Node, val right: Node)

  /** Build from parallel (row, lo, hi) arrays; null or inverted
    * bounds are dropped (they can never match).
    */
  def build(rows: Array[InternalRow], boundLo: Expression,
      boundHi: Expression, ordering: Ordering[Any],
      loStrict: Boolean, hiStrict: Boolean): IntervalTree = {
    val items = rows.iterator.map { r =>
      (boundLo.eval(r), boundHi.eval(r), r)
    }.filter { case (lo, hi, _) =>
      lo != null && hi != null && !ordering.gt(lo, hi)
    }.toArray

    def rec(its: Array[(Any, Any, InternalRow)]): Node = {
      if (its.isEmpty) return null
      val endpoints = its.flatMap(t => Array(t._1, t._2)).sorted(ordering)
      val center = endpoints(endpoints.length / 2)
      val here = ArrayBuffer[(Any, Any, InternalRow)]()
      val lt = ArrayBuffer[(Any, Any, InternalRow)]()
      val rt = ArrayBuffer[(Any, Any, InternalRow)]()
      its.foreach { t =>
        if (ordering.lt(t._2, center)) lt += t
        else if (ordering.gt(t._1, center)) rt += t
        else here += t
      }
      val byLo = here.sortWith((a, b) => ordering.lt(a._1, b._1)).toArray
      val byHi = here.sortWith((a, b) => ordering.gt(a._2, b._2)).toArray
      new Node(center,
        byLo.map(_._1), byLo.map(_._2), byLo.map(_._3),
        byHi.map(_._2), byHi.map(_._3),
        rec(lt.toArray), rec(rt.toArray))
    }
    new IntervalTree(rec(items), ordering, loStrict, hiStrict)
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
    val bc = sparkContext.broadcast(
      RangeProbe.buildArrays(collected, boundLo, boundHi, ordering))

    val boundIp = BindReferences.bindReference(ipExpr, factsOutput)
    val joinedInput =
      if (rangesOnRight) factsOutput ++ rangesOutput
      else rangesOutput ++ factsOutput
    val boundExtra = extraCond.map(BindReferences.bindReference(_, joinedInput))
    val numOutputRows = longMetric("numOutputRows")

    left.execute().mapPartitions { iter =>
      val (ranges, lo, hi, mh) = bc.value
      val index = new RangeProbeIndex(ranges, lo, hi, mh, ordering,
        loStrict, hiStrict)
      val joined = new JoinedRow
      val nullRange = new GenericInternalRow(rangesOutput.length)
      val resultProj = UnsafeProjection.create(output, output)

      iter.flatMap { factRow =>
        val out = ArrayBuffer[InternalRow]()
        index.foreachMatch(boundIp.eval(factRow)) { rangeRow =>
          val jr = if (rangesOnRight) joined(factRow, rangeRow)
            else joined(rangeRow, factRow)
          if (boundExtra.forall(_.eval(jr) == true))
            out += resultProj(jr).copy()
        }
        if (out.isEmpty && joinType == LeftOuter) {
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

/** Range-partitioned sorted-interval join — the escalation for range
  * tables that OUTGROW a broadcast (SURVEY §4's "proper engine
  * feature" milestone; reference probe semantics iputils.go:111-128).
  *
  * Physical algorithm:
  *  1. Sample the FACT side's probe keys (Spark's own
  *     [[RangePartitioner]] sketch — the same machinery behind every
  *     global sort) to derive partition boundaries. Sampling the
  *     facts, not the ranges, is what makes the operator robust to
  *     fact skew: a /8-heavy range table over facts piled into one
  *     /8 still splits that hot /8 across many partitions, where a
  *     prefix-bucket join funnels them all into one bucket.
  *  2. Shuffle facts by probe-key partition; ship each range row to
  *     EVERY partition its [lo, hi] overlaps (duplication factor ≤
  *     the partition count, dimension-side cost only — the
  *     partitioner is monotonic, so lo ≤ ip ≤ hi pins every cover
  *     to the probe's partition).
  *  3. Per partition: sort the local ranges by lo with the prefix
  *     max-hi ([[RangeProbe]]), probe each fact by binary search —
  *     O(log n + k), overlap-correct, no BNLJ, no driver collect.
  *
  * The extra job is the boundary sample (the cost every range
  * shuffle pays); facts then move ONCE. Null probe keys route to
  * partition 0 and match nothing (LeftOuter still emits them
  * null-extended). Rows cross the wire as UnsafeRow (Externalizable
  * — byte-buffer writes, not field-by-field Java serialization).
  */
case class ShuffleRangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    ipExpr: Expression, loExpr: Expression, hiExpr: Expression,
    loStrict: Boolean, hiStrict: Boolean,
    extraCond: Option[Expression], joinType: JoinType,
    factsOutput: Seq[Attribute], rangesOutput: Seq[Attribute],
    rangesOnRight: Boolean)
  extends BinaryExecNode {

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
    val boundIp = BindReferences.bindReference(ipExpr, factsOutput)
    val boundLo = BindReferences.bindReference(loExpr, rangesOutput)
    val boundHi = BindReferences.bindReference(hiExpr, rangesOutput)

    // UnsafeRow-project both sides before the RDD shuffle: UnsafeRow
    // serializes as one buffer write, and each deserialized record is
    // a fresh object (safe to hold across the partition build)
    val factKeyed: RDD[(Any, InternalRow)] =
      left.execute().mapPartitions { it =>
        val proj = UnsafeProjection.create(factsOutput, factsOutput)
        it.map { r0 =>
          val r = proj(r0).copy()
          (boundIp.eval(r), r: InternalRow)
        }
      }
    implicit val ordAny: Ordering[Any] = ordering
    implicit val tagAny: ClassTag[Any] = ClassTag.Any
    val parts = math.max(1, conf.numShufflePartitions)
    val rp = new RangePartitioner[Any, InternalRow](parts,
      factKeyed.filter(_._1 != null))
    val nParts = rp.numPartitions
    val factPartitioner = new Partitioner {
      override def numPartitions: Int = nParts
      override def getPartition(key: Any): Int =
        if (key == null) 0 else rp.getPartition(key)
    }
    val factsPart = factKeyed.partitionBy(factPartitioner)

    val rangesDup: RDD[(Int, InternalRow)] =
      right.execute().mapPartitions { it =>
        val proj = UnsafeProjection.create(rangesOutput, rangesOutput)
        it.flatMap { r0 =>
          val r = proj(r0).copy()
          val lo = boundLo.eval(r)
          val hi = boundHi.eval(r)
          if (lo == null || hi == null || ordering.gt(lo, hi))
            Iterator.empty
          else {
            val p0 = rp.getPartition(lo)
            val p1 = rp.getPartition(hi)
            (p0 to p1).iterator.map(p => (p, r: InternalRow))
          }
        }
      }
    val rangesPart = rangesDup.partitionBy(new Partitioner {
      override def numPartitions: Int = nParts
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    })

    val joinedInput =
      if (rangesOnRight) factsOutput ++ rangesOutput
      else rangesOutput ++ factsOutput
    val boundExtra = extraCond.map(BindReferences.bindReference(_, joinedInput))
    val numOutputRows = longMetric("numOutputRows")
    val outAttrs = output

    factsPart.zipPartitions(rangesPart) { (fIt, rIt) =>
      val index = IntervalTree.build(rIt.map(_._2).toArray,
        boundLo, boundHi, ordering, loStrict, hiStrict)
      val joined = new JoinedRow
      val nullRange = new GenericInternalRow(rangesOutput.length)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      fIt.flatMap { case (ip, factRow) =>
        val out = ArrayBuffer[InternalRow]()
        index.foreachMatch(ip) { rangeRow =>
          val jr = if (rangesOnRight) joined(factRow, rangeRow)
            else joined(rangeRow, factRow)
          if (boundExtra.forall(_.eval(jr) == true))
            out += resultProj(jr).copy()
        }
        if (out.isEmpty && joinType == LeftOuter) {
          out += resultProj(joined(factRow, nullRange)).copy()
        }
        numOutputRows += out.length
        out.iterator
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ShuffleRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for point-in-range joins. Physical pick:
  *
  *  - ranges side hinted `merge` → [[ShuffleRangeJoinExec]] (the
  *    explicit over-broadcast escalation);
  *  - ranges side under the broadcast threshold (or hinted
  *    `broadcast`) → [[BroadcastRangeJoinExec]];
  *  - over-threshold with NO usable equi-conjunct in the remaining
  *    condition → [[ShuffleRangeJoinExec]] (Spark's own fallback
  *    would be a BroadcastNestedLoopJoin);
  *  - otherwise decline — an equi-conjunct means Spark can plan a
  *    hash join with the range predicate as residual (the
  *    BucketedRangeJoin shape), which must not be hijacked.
  */
object RangeJoinStrategy extends SparkStrategy {
  private def hasEquiConjunct(rest: Seq[Expression], facts: LogicalPlan,
      ranges: LogicalPlan): Boolean = rest.exists {
    case EqualTo(l, r) =>
      def spans(a: Expression, b: Expression): Boolean =
        a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(facts.outputSet) &&
          b.references.subsetOf(ranges.outputSet)
      spans(l, r) || spans(r, l)
    case _ => false
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPattern(facts, ranges, ip, lo, hi, loStrict, hiStrict,
        rest, joinType, rangesOnRight) =>
      val hint = plan match {
        case j: Join => j.hint
        case _ => JoinHint.NONE
      }
      val rangesHint =
        (if (rangesOnRight) hint.rightHint else hint.leftHint)
          .flatMap(_.strategy)
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      val small = threshold > 0 && ranges.stats.sizeInBytes <= threshold
      val extra = rest.reduceOption(And)
      def shuffleExec = ShuffleRangeJoinExec(planLater(facts),
        planLater(ranges), ip, lo, hi, loStrict, hiStrict, extra,
        joinType, facts.output, ranges.output, rangesOnRight)
      def broadcastExec = BroadcastRangeJoinExec(planLater(facts),
        planLater(ranges), ip, lo, hi, loStrict, hiStrict, extra,
        joinType, facts.output, ranges.output, rangesOnRight)
      if (rangesHint.contains(SHUFFLE_MERGE)) shuffleExec :: Nil
      else if (small || rangesHint.contains(BROADCAST)) broadcastExec :: Nil
      else if (!hasEquiConjunct(rest, facts, ranges)) shuffleExec :: Nil
      else Nil
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the range-join planner strategy, the [[AggViewRewrite]]
  * materialized-view rewrite rule, and registers the
  * Unicode-normalization scalar functions for SQL-string users
  * (`SELECT nfc_normalize(s) …`), mirroring their Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
    e.injectOptimizerRule(s => AggViewRewrite.Rule(s))
    e.injectOptimizerRule(s => ColStatsInjection.Rule(s))
    e.injectOptimizerRule(s => ZoneMapScan.Rule(s))
    GraftExtensions.sqlScalars.foreach { case (name, build) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName,
          name),
        GraftExtensions.arity1(name, build)))
    }
  }
}

object GraftExtensions {
  private[plans] def arity1(name: String,
      build: Expression => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == 1, s"$name expects exactly one argument")
      build(args.head)
    }

  /** The SQL-string scalar surface (one shared list: config-time
    * injection above and live-session registration below).
    */
  private[plans] val sqlScalars: Seq[(String, Expression => Expression)] =
    Seq(
      "nfc_normalize" -> graft.functions.NfcNormalize.apply _,
      "nfkc_normalize" -> graft.functions.NfkcNormalize.apply _,
      "strip_accents" -> graft.functions.StripAccents.apply _)

  /** Register the same functions on a LIVE session (tests,
    * interactive shells); production sessions get them via the
    * `spark.sql.extensions` config.
    */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlScalars.foreach { case (name, build) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        arity1(name, build))
    }
}
