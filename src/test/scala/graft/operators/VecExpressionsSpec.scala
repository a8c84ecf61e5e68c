package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Bit-parity of the codegen vector expressions against their
  * composed Column-algebra references, including the composed forms'
  * null/mismatch edges — the expressions must be DROP-IN swaps under
  * the DuckDB hash contract.
  */
class VecExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rng = new scala.util.Random(23)
  private def randFloats(n: Int): Seq[Float] =
    Seq.fill(n)((rng.nextFloat() - 0.5f) * 1.2f)
  private def randLongs(n: Int): Seq[Long] =
    Seq.fill(n)((rng.nextInt(1161) - 580).toLong)

  test("quantize_vec equals the composed round/cast transform, " +
      "including exact .5 ties and null elements") {
    import spark.implicits._
    val vecs: Seq[Seq[Float]] = (0 until 200).map(_ => randFloats(64)) ++
      // exact binary fractions land on .5 after ×1000: HALF_UP edges
      Seq(Seq(0.0625f, -0.0625f, 0.1875f, -0.3125f, 0f, 1f, -1f),
        Seq.empty[Float])
    val rows = vecs.toDF("v").select(
      Similarity.quantize(col("v")).as("fast"),
      Similarity.quantizeComposed(col("v")).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // null elements stay null both ways
    val withNull = Seq(Seq[java.lang.Float](1.5f, null, -2.5f)).toDF("v")
      .select(Similarity.quantize(col("v")).as("fast"),
        Similarity.quantizeComposed(col("v")).as("slow")).collect().head
    assert(withNull.getSeq[Any](0) == withNull.getSeq[Any](1))
    // null array → null both ways
    val n = Seq[Option[Seq[Float]]](None).toDF("v")
      .select(Similarity.quantize(col("v")).as("fast"),
        Similarity.quantizeComposed(col("v")).as("slow")).collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
    // NaN/Inf elements → NULL (documented deviation: the composed
    // form's ANSI cast throws; a degenerate embedding must not kill
    // the job). Finite neighbors still quantize.
    val weird = Seq(Seq(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, 1.5f)).toDF("v")
      .select(Similarity.quantize(col("v")).as("fast")).collect().head
    assert(weird.getSeq[Any](0) == Seq(null, null, null, 1500L))
  }

  test("cosine_int equals the composed dot/sqrt chain, including " +
      "zero vectors, length mismatch and null elements") {
    import spark.implicits._
    val pairs: Seq[(Seq[Long], Seq[Long])] =
      (0 until 200).map(_ => (randLongs(64), randLongs(64))) :+
        ((randLongs(64), randLongs(32)))   // mismatch → null
    val rows = pairs.toDF("a", "b").select(
      Similarity.cosineInt(col("a"), col("b")).as("fast"),
      Similarity.cosineIntComposed(col("a"), col("b")).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0
          || (r.getDouble(0).isNaN && r.getDouble(1).isNaN))
    }
    // null element nulls the similarity both ways
    val withNull = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
      .select(Similarity.cosineInt(col("a"), col("b")).as("fast"),
        Similarity.cosineIntComposed(col("a"), col("b")).as("slow"))
      .collect().head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("cosine_int on a zero vector returns NULL where the composed " +
      "ANSI divide would error a distributed job") {
    import spark.implicits._
    val zero = Seq((Seq.fill(64)(0L), randLongs(64)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val fast = zero.select(
      Similarity.cosineInt(col("a"), col("b"))).collect()
    assert(fast.forall(_.isNullAt(0)))
    val err = intercept[Exception] {
      zero.select(Similarity.cosineIntComposed(col("a"), col("b")))
        .collect()
    }
    assert(err.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("cosine_int / cosine_float / quantize_vec are SQL-registered " +
      "with analysis-time checks") {
    graft.Graft.install(spark)
    val got = spark.sql(
      "SELECT cosine_int(array(1L, 0L), array(1L, 0L)), " +
        "cosine_float(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "  array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))), " +
        "quantize_vec(array(CAST(0.0625 AS DOUBLE)))")
      .collect().head
    assert(got.getDouble(0) == 1.0)
    assert(got.getDouble(1) == 0.0)
    assert(got.getSeq[Long](2) == Seq(63L)) // 62.5 HALF_UP
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_int(42, 43)").collect()
    }
    assert(err.getMessage.contains("ARRAY"))
  }

  test("cosine_float / sign_bucket_float equal the composed float " +
      "chains (left-to-right IEEE folds)") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(64, 8)
    val pairs: Seq[(Seq[Float], Seq[Float])] =
      (0 until 200).map(_ => (randFloats(64), randFloats(64))) :+
        ((randFloats(64), randFloats(32)))
    val rows = pairs.toDF("a", "b").select(
      Similarity.cosine(col("a"), col("b")).as("fast"),
      Similarity.cosineComposed(col("a"), col("b")).as("slow"),
      Similarity.lshBucket(col("a"), planes).as("fastb"),
      Similarity.lshBucketComposed(col("a"), planes).as("slowb"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("sign_bucket_int equals the composed per-plane when/otherwise " +
      "chain, including null input → 0") {
    import spark.implicits._
    val planes = Similarity.signPlanes(64, 8)
    val vecs = (0 until 200).map(_ => randLongs(64)) ++
      Seq(Seq.fill(64)(0L), Seq.empty[Long], randLongs(32))
    val rows = vecs.toDF("q").select(
      Similarity.intLshBucket(col("q"), planes).as("fast"),
      Similarity.intLshBucketComposed(col("q"), planes).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val n = Seq[Option[Seq[Long]]](None).toDF("q").select(
      Similarity.intLshBucket(col("q"), planes).as("fast"),
      Similarity.intLshBucketComposed(col("q"), planes).as("slow"))
      .collect().head
    assert(n.getLong(0) == n.getLong(1))
  }

  test("nearest_centroid_int / probe_buckets_int equal the composed " +
      "struct argmin/sort, including distance ties") {
    import spark.implicits._
    val cents: Seq[Seq[Long]] = Seq.fill(8)(randLongs(64))
    // duplicated centroid forces an exact distance tie → smaller index
    val centsWithTie = cents.updated(5, cents(2))
    for (cs <- Seq(cents, centsWithTie)) {
      val vecs = (0 until 150).map(_ => randLongs(64)) ++
        cs.take(3) // exact centroid hits (distance 0)
      val rows = vecs.toDF("q").select(
        Ivf.assignInt(col("q"), cs).as("fast"),
        Ivf.assignIntComposed(col("q"), cs).as("slow"),
        Ivf.probeBucketsInt(col("q"), cs, 3).as("fastp"),
        Ivf.probeBucketsIntComposed(col("q"), cs, 3).as("slowp"))
        .collect()
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(1))
        assert(r.getSeq[Int](2) == r.getSeq[Int](3))
      }
    }
    val n = Seq[Option[Seq[Long]]](None).toDF("q").select(
      Ivf.assignInt(col("q"), cents).as("fast"),
      Ivf.assignIntComposed(col("q"), cents).as("slow"),
      Ivf.probeBucketsInt(col("q"), cents, 2).as("fastp"),
      Ivf.probeBucketsIntComposed(col("q"), cents, 2).as("slowp"))
      .collect().head
    assert(n.getInt(0) == n.getInt(1))
    assert(n.getSeq[Int](2) == n.getSeq[Int](3))
  }
}
