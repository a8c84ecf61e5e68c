package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** ZOrder.interleave16 column algebra ≡ the plain-Scala reference,
  * including the locality property that justifies the operator.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("column expression matches reference on boundary + random grid") {
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L),
      (0L, 65535L), (1L, 2L), (43690L, 21845L)) ++
      (0 until 200).map(i => ((i * 2654435761L) % 65536,
        (i * 40503L) % 65536))
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.interleave16(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.interleave16Ref(x, y), s"($x,$y)")
    }
  }

  test("interleave is a bijection on the 16-bit grid sample") {
    val zs = (0 until 1000).map(i =>
      ZOrder.interleave16Ref((i * 7919L) % 65536, (i * 104729L) % 65536))
    assert(zs.distinct.size == zs.size)
  }

  test("z-sorted runs have bounded per-dimension spans (locality)") {
    // sort a 64x64 grid by z; each run of 64 consecutive keys must
    // span at most 1/4 of each dimension's range (Morton guarantees
    // power-of-two-aligned quadrants; a row-major sort spans the
    // FULL x range in every run)
    val grid = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x * 1024, y * 1024)
    val sorted = grid.sortBy(p => ZOrder.interleave16Ref(p._1, p._2))
    sorted.grouped(64).foreach { run =>
      val xs = run.map(_._1); val ys = run.map(_._2)
      assert(xs.max - xs.min <= 16384 && ys.max - ys.min <= 16384)
    }
  }
}
