package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CCNet-style head/middle/tail bucketing: histogram-derived tercile
  * cutoffs, whole-bin assignment at the boundaries, and per-group
  * independence — hand-checked against the ceil(n/3)/ceil(2n/3) rule.
  */
class PerplexityBucketsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def buckets(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    val df = rows.toDF("g", "id", "score")
    TextAnalysis.perplexityBuckets(df, "g", "score")
      .select("g", "id", "bucket").as[(String, Long, String)]
      .collect().map { case (g, id, b) => (g, id) -> b }.toMap
  }

  test("six singleton bins split cleanly into thirds, best scores " +
      "to head") {
    val got = buckets(Seq(
      ("g", 1L, -1.05), ("g", 2L, -1.15), ("g", 3L, -1.25),
      ("g", 4L, -1.35), ("g", 5L, -1.45), ("g", 6L, -1.55)))
    assert(got == Map(
      ("g", 1L) -> "head", ("g", 2L) -> "head",
      ("g", 3L) -> "middle", ("g", 4L) -> "middle",
      ("g", 5L) -> "tail", ("g", 6L) -> "tail"))
  }

  test("a bin straddling a cutoff goes whole to the better bucket") {
    // bins: -11 holds two docs (crosses t1=2), then -13, -14; n=4
    val got = buckets(Seq(
      ("g", 1L, -1.05), ("g", 2L, -1.06),
      ("g", 3L, -1.25), ("g", 4L, -1.35)))
    assert(got == Map(
      ("g", 1L) -> "head", ("g", 2L) -> "head",
      ("g", 3L) -> "middle", ("g", 4L) -> "tail"))
  }

  test("groups bucket independently") {
    val got = buckets(Seq(
      ("x", 1L, -1.05), ("x", 2L, -1.15), ("x", 3L, -1.25),
      ("y", 4L, -9.05), ("y", 5L, -9.15), ("y", 6L, -9.25)))
    assert(got(("x", 1L)) == "head" && got(("x", 2L)) == "middle" &&
      got(("x", 3L)) == "tail")
    assert(got(("y", 4L)) == "head" && got(("y", 5L)) == "middle" &&
      got(("y", 6L)) == "tail")
  }

  test("a single-doc group is all head") {
    assert(buckets(Seq(("g", 1L, -2.5))) == Map(("g", 1L) -> "head"))
  }
}
