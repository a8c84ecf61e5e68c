package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{IpFunctions, IpMath}

/** Range-table normalization (SURVEY §2.5 A1/A2): turn nested /
  * overlapping CIDR ranges into the sorted, disjoint partition the
  * point-in-range lookup requires.
  *
  * Semantics mirror the reference's stack algorithm
  * (iputils.go:140-264): child ranges punch holes in parents, parent
  * remnants re-emit between/after children, a new range whose payload
  * equals the last-emitted node's and which overlaps-or-abuts it is
  * absorbed (merge-before-flatten interleaving, iputils.go:167-178),
  * and degenerate `lo > hi` remnants are dropped (the documented
  * intersection-bug fix, iputils.go:207-214 — applied here to every
  * emission site, not just finalize).
  *
  * Why `mapPartitions` and not a window pipeline: the stack pass is a
  * sequential fold over a laminar family — parent payload resumption
  * needs the innermost *still-open* ancestor, which plain (non-
  * recursive) window functions cannot track. The scale path is
  * parallelism *across* groups (dataset × family × snapshot): each
  * group is one ingest-time dimension table (~4 M rows for GeoLite2),
  * processed linearly in one task after a hash repartition on the
  * group keys. Fact-side scale never touches this code.
  */
object Ranges {

  /** Flatten nested/overlapping ranges into sorted disjoint ranges.
    *
    * @param df       input with BinaryType `loCol`/`hiCol` (canonical
    *                 16-byte IPs or any unsigned-comparable binary)
    * @param groupCols independent range lists (e.g. dataset, family);
    *                 flattening never crosses a group boundary
    * @param loCol/hiCol inclusive bounds
    * Remaining columns are the payload; payload equality drives the
    * absorb rule (DataEquals, geo-ip-ip-loader.go:40-43).
    */
  def flattenRanges(df: DataFrame, groupCols: Seq[String],
      loCol: String = "lo", hiCol: String = "hi"): DataFrame = {
    val payloadCols = df.columns.filterNot(c =>
      groupCols.contains(c) || c == loCol || c == hiCol).toSeq
    val ordered = Seq(loCol, hiCol) ++ payloadCols
    val cols = groupCols ++ ordered
    // seq keeps input order on (lo, hi) ties, like the reference's
    // read order; parents (wider hi) sort before their children.
    val prepared = df
      .select(cols.map(col): _*)
      .withColumn("__seq", monotonically_increasing_id())
    val parted =
      if (groupCols.nonEmpty)
        prepared.repartition(groupCols.map(col): _*)
          .sortWithinPartitions(
            groupCols.map(col) ++ Seq(col(loCol).asc, col(hiCol).desc,
              col("__seq").asc): _*)
      else prepared.repartition(1)
        .sortWithinPartitions(col(loCol).asc, col(hiCol).desc, col("__seq").asc)

    val outSchema = prepared.drop("__seq").schema
    val nGroup = groupCols.length
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)

    parted.mapPartitions { it =>
      new Iterator[Iterator[Row]] {
        private var cur: Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = cur != null
        def next(): Iterator[Row] = {
          val key = groupKey(cur, nGroup)
          val buf = ArrayBuffer[Row]()
          while (cur != null && groupKey(cur, nGroup) == key) {
            buf += cur
            cur = if (it.hasNext) it.next() else null
          }
          flattenGroup(buf, nGroup).iterator
        }
      }.flatten
    }
  }

  private def groupKey(r: Row, nGroup: Int): Seq[Any] =
    (0 until nGroup).map { i =>
      r.get(i) match {
        // Array == is reference equality; normalize binary keys so
        // group-boundary detection compares by value
        case b: Array[Byte] => b.toSeq
        case other => other
      }
    }

  /** One range being assembled: bounds are mutable (the stack pass
    * adjusts the last emitted node and stack remnants in place).
    */
  private final class Node(var lo: Array[Byte], var hi: Array[Byte],
      val payload: Row, val group: Seq[Any]) {
    def cloneNode: Node = new Node(lo, hi, payload, group)
    def toRow: Row = Row.fromSeq(group ++ Seq(lo, hi) ++ payload.toSeq)
  }

  /** The reference's Consume + handleStack + finalizeStackAndList
    * pass, with the lo>hi degenerate guard at every emission site.
    */
  private def flattenGroup(rows: ArrayBuffer[Row], nGroup: Int): Seq[Row] = {
    val out = ArrayBuffer[Node]()
    var stack = List[Node]()

    def lt(a: Array[Byte], b: Array[Byte]): Boolean = IpMath.compare(a, b) < 0
    def emit(n: Node): Unit = if (!lt(n.hi, n.lo)) out += n

    for (r <- rows) {
      val group = (0 until nGroup).map(r.get)
      val lo = r.getAs[Array[Byte]](nGroup)
      val hi = r.getAs[Array[Byte]](nGroup + 1)
      val payload = Row.fromSeq(
        (nGroup + 2 until r.length - 1).map(r.get)) // excludes __seq
      if (lo != null && hi != null && !lt(hi, lo)) {
        val nn = new Node(lo, hi, payload, group)
        // merge-before-flatten: absorb into the last emitted node
        // when overlapping-or-adjacent with equal payload
        val last = out.lastOption.orNull
        // lo == minimum key: nothing can precede it, so an existing
        // last node necessarily overlaps — and ipAdd(lo, -1) would
        // wrap to the max key and wrongly fail the compare
        if (last != null && last.payload == nn.payload
            && (IpMath.isZero(nn.lo)
              || IpMath.compare(last.hi, IpMath.ipAdd(nn.lo, -1)) >= 0)) {
          if (lt(last.hi, nn.hi)) {
            last.hi = nn.hi
            // keep the resumption bookkeeping consistent: if the
            // absorbed range reaches past the innermost open child,
            // the parent must resume after the *merged* end, not the
            // child's original end (the Go reference skips this and
            // can emit overlapping output — a disjointness fix, see
            // RangesSpec "merge absorb keeps output disjoint")
            if (stack.nonEmpty && lt(stack.head.hi, nn.hi) &&
                !lt(nn.hi, stack.head.lo))
              stack.head.hi = nn.hi
          }
        } else {
          // handleStack
          if (stack.nonEmpty) {
            if (lt(stack.head.hi, nn.lo)) {
              // closing nested ranges
              var pop = stack.head
              stack = stack.tail
              var done = false
              while (!done && stack.nonEmpty) {
                val peek = stack.head
                // <= (not <, as in the Go reference): when nn starts
                // exactly at the ancestor's end the ancestor still
                // covers nn.lo and must stay open, else its full tail
                // would be emitted overlapping nn at one address
                if (!lt(peek.hi, nn.lo)) {
                  // resume the parent between the last child and nn
                  val seg = peek.cloneNode
                  seg.lo = IpMath.ipAdd(pop.hi, 1)
                  seg.hi = IpMath.ipAdd(nn.lo, -1)
                  emit(seg)
                  done = true
                } else {
                  val seg = peek.cloneNode
                  seg.lo = IpMath.ipAdd(pop.hi, 1)
                  emit(seg)
                  pop = peek
                  stack = stack.tail
                }
              }
            } else {
              // nesting: truncate the last emitted node at nn.lo-1;
              // when nn.lo is the minimum key the remnant is empty —
              // drop it outright instead of letting ipAdd wrap the
              // bound to the max key (would emit an overlapping node)
              val last2 = out.lastOption.orNull
              if (last2 != null) {
                if (IpMath.isZero(nn.lo)) out.remove(out.length - 1)
                else {
                  last2.hi = IpMath.ipAdd(nn.lo, -1)
                  if (lt(last2.hi, last2.lo)) out.remove(out.length - 1)
                }
              }
            }
          }
          stack = nn :: stack
          emit(nn.cloneNode)
        }
      }
    }
    // finalize: re-emit parent tails still on the stack
    if (stack.nonEmpty) {
      var pop = stack.head
      stack = stack.tail
      while (stack.nonEmpty) {
        val peek = stack.head
        peek.lo = IpMath.ipAdd(pop.hi, 1)
        if (!lt(peek.hi, peek.lo)) out += peek
        pop = peek
        stack = stack.tail
      }
    }
    out.map(_.toRow).toSeq
  }

  /** A2 adjacent-range merge as a pure window pipeline (gaps-and-
    * islands): consecutive ranges with equal payload that overlap or
    * abut collapse into one. Mirrors Consume/canBeMergedByIP
    * (iputils.go:155-184).
    */
  def mergeAdjacent(df: DataFrame, groupCols: Seq[String],
      loCol: String = "lo", hiCol: String = "hi"): DataFrame = {
    val payloadCols = df.columns.filterNot(c =>
      groupCols.contains(c) || c == loCol || c == hiCol).toSeq
    val w =
      if (groupCols.nonEmpty)
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(loCol))
      else Window.partitionBy().orderBy(col(loCol))
    val pay =
      if (payloadCols.nonEmpty) struct(payloadCols.map(col): _*) else lit(1)
    // compare against the running max of hi, not lag(hi): the
    // reference merges into the last *output* node, whose hi is the
    // extended (max-so-far) bound — lag alone splits chained overlaps
    val prevMaxHi = max(col(hiCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    // lo-1 > lo detects wrap-around at the minimum key, where any
    // predecessor necessarily overlaps-or-abuts
    val loM1 = IpFunctions.ip_minus_one(col(loCol))
    val overlapOrAbut = (prevMaxHi >= loM1) || (loM1 > col(loCol))
    val newGroup =
      (!overlapOrAbut || !(lag(pay, 1).over(w) <=> pay)).cast("int")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gid = sum(coalesce(newGroup, lit(1))).over(wRun)
    df.withColumn("__gid", gid)
      .groupBy((groupCols.map(col) :+ col("__gid")): _*)
      .agg(min(col(loCol)).as(loCol),
        (max(col(hiCol)).as(hiCol) +:
          payloadCols.map(c => first(col(c)).as(c))): _*)
      .drop("__gid")
      .select((groupCols ++ Seq(loCol, hiCol) ++ payloadCols).map(col): _*)
  }
}
