package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** minhash_agg(gram, k): one-pass MinHash signature as a custom
  * Catalyst aggregate (TypedImperativeAggregate) — the buffer is a
  * flat long[k], update takes k seeded xxhash64 mins per input gram,
  * merge is elementwise min, so the signature partial-aggregates
  * map-side like any native aggregate. SQL-registrable; alternative
  * to the k-column formulation in [[graft.operators.Dedup]].
  */
case class MinHashAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(v, child.dataType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null
    else new GenericArrayData(buf.map(java.lang.Long.valueOf))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MinHashAgg = copy(child = cs.head)
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Column API: `minhash_agg(gram, k)` aggregate. */
  def minhash_agg(gram: Column, k: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(gram), k).toAggregateExpression())

  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "minhash_agg", exprs =>
      MinHashAgg(exprs.head, exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => other.eval(null).asInstanceOf[Int]
      }).toAggregateExpression())
}
