package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Similarity.mmrRerank: greedy diversity semantics, λ extremes, and
  * the bounded-collect guard.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // three near-identical "A" vectors with top relevance and one
  // orthogonal "B": pure relevance would pick A A A; MMR must
  // interleave B once an A is taken
  private def cands = {
    import spark.implicits._
    Seq(
      (1L, 0.99, Seq(1000L, 0L, 0L)),
      (2L, 0.98, Seq(999L, 10L, 0L)),
      (3L, 0.97, Seq(998L, 20L, 0L)),
      (4L, 0.60, Seq(0L, 0L, 1000L)))
      .toDF("vec_id", "rel", "q")
  }

  test("diversity beats raw relevance once a near-dup is selected") {
    val got = Similarity.mmrRerank(cands, "vec_id", "rel", "q",
        k = 3, lambdaTenths = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // pick 1: top rel (id 1); pick 2: ids 2,3 are ~identical to 1
    // (sim ~1 → score ~ 5*0.98-5*1 < 0), B scores 5*0.6-5*0 = 3
    assert(got === Seq((1L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("lambda=10 degenerates to pure relevance order") {
    val got = Similarity.mmrRerank(cands, "vec_id", "rel", "q",
        k = 4, lambdaTenths = 10)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 2L, 3L, 4L))
  }

  test("k beyond the candidate count returns every candidate once") {
    val got = Similarity.mmrRerank(cands, "vec_id", "rel", "q", k = 99)
      .collect().map(_.getLong(1)).toSeq
    assert(got.sorted === Seq(1L, 2L, 3L, 4L))
  }

  test("the bounded-collect guard rejects oversized candidate sets") {
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, "vec_id", "rel", "q", k = 2,
        maxCandidates = 3)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }
}
