package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Sq8: integer floor-division encode bounds and the asymmetric
  * scoring ranked against an in-memory exact reference.
  */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (0L until 120L).map(i =>
      (i, Seq.fill(16)((rnd.nextInt(800001) - 400000).toLong)))
      .toDF("vec_id", "q")
  }

  test("codes stay in [-127, 127] and reconstruction error is " +
      "bounded by the scale, including negative components") {
    val enc = corpus()
      .withColumn("s", Sq8.scaleOf(col("q")))
      .withColumn("c", Sq8.encode(col("q"), col("s")))
      .collect()
    for (r <- enc) {
      val q = r.getSeq[Long](r.fieldIndex("q"))
      val s = r.getLong(r.fieldIndex("s"))
      val c = r.getSeq[Long](r.fieldIndex("c"))
      assert(s >= 1)
      for ((qi, ci) <- q.zip(c)) {
        assert(ci == Math.floorDiv(qi, s),
          s"code must be exact floor division: $qi / $s")
        assert(ci >= -128 && ci <= 127, s"code out of byte range: $ci")
        assert(qi - ci * s >= 0 && qi - ci * s < s,
          "reconstruction residue must be the floor-division remainder")
      }
    }
  }

  test("all-zero vector clamps to scale 1 instead of dividing by zero") {
    import spark.implicits._
    val z = Seq((0L, Seq.fill(16)(0L))).toDF("vec_id", "q")
      .withColumn("s", Sq8.scaleOf(col("q")))
      .withColumn("c", Sq8.encode(col("q"), col("s")))
      .collect()(0)
    assert(z.getLong(z.fieldIndex("s")) == 1L)
    assert(z.getSeq[Long](z.fieldIndex("c")).forall(_ == 0L))
  }

  test("topK matches the exact in-memory asymmetric scoring with " +
      "score-desc, lowest-id tie-breaks") {
    val rows = corpus().collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val probe = rows.find(_._1 == 0L).get._2
    def scoreOf(q: Array[Long]): Long = {
      val m = q.map(math.abs).max
      val s = math.max(1L, Math.floorDiv(m + 126L, 127L))
      s * q.map(Math.floorDiv(_, s)).zip(probe).map { case (a, b) => a * b }.sum
    }
    val want = rows.filter(_._1 > 0)
      .map { case (id, q) => (id, scoreOf(q)) }
      .sortBy { case (id, sc) => (-sc, id) }.take(7).toSeq
    import spark.implicits._
    val probes = corpus().filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"))
    val got = Sq8.topK(corpus().filter(col("vec_id") > 0), probes, 7)
      .orderBy("rank").collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getLong(r.fieldIndex("sq8")))).toSeq
    assert(got == want)
  }
}
