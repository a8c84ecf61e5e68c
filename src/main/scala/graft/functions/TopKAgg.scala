package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: entries ordered best-first by
  * (score DESC, id ASC). Insertion keeps the array sorted — k is
  * small (10s–100s), so a shift-insert beats heap constant factors
  * and keeps `eval` allocation-free ordering.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // Double.compare, not `>`: NaN must rank ABOVE every score, the
  // way both Spark's and DuckDB's ORDER BY sim DESC place it — a
  // plain `>` is always false for NaN and would silently drop such
  // rows from the top-k, diverging from the window/oracle ranking
  @inline private def beats(s: Double, id: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(s: Double, id: Long): Unit = {
    if (size == k && !beats(s, id, k - 1)) return
    var pos = if (size == k) k - 1 else size
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1)
      ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = s
    ids(pos) = id
    if (size < k) size += 1
  }
}

/** top_k_agg(score, id, k): bounded per-group top-k as a custom
  * Catalyst aggregate. Unlike `row_number() OVER (PARTITION BY g)`,
  * this partial-aggregates map-side — each task reduces its slice to
  * ≤k entries per group before the shuffle, so only k·partitions rows
  * move per group instead of the whole scored input funneling through
  * one window task. Output: ARRAY<STRUCT<score DOUBLE, id BIGINT>>
  * ordered best-first (score DESC, id ASC); posexplode for rank.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "top_k_agg: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData((0 until buf.size).map { i =>
      InternalRow(buf.scores(i), buf.ids(i))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // entries arrive best-first and insert preserves order, so this
    // reproduces the serialized buffer exactly
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKAgg =
    copy(score = cs(0), id = cs(1))
  override def prettyName: String = "top_k_agg"
}

object TopKAgg {
  /** Column API: `top_k_agg(score, id, k)` aggregate. */
  def top_k_agg(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(score),
        GraftBridge.expression(id), k).toAggregateExpression())

  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "top_k_agg", exprs =>
      TopKAgg(exprs(0), exprs(1), exprs(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => other.eval(null).asInstanceOf[Int]
      }).toAggregateExpression())
}
