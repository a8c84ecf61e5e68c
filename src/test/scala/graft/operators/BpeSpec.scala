package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE merge training: hand-checked goldens for the argmax tie-break,
  * the leftmost-non-overlapping fold, and merge strings that would
  * break naive SQL splicing.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("classic low/lowest corpus: counts weight by word frequency, " +
      "ties break (count desc, left asc, right asc)") {
    val got = TextAnalysis.bpeMerges(corpus("low low lowest"), "text", 3)
    // (l,o) and (o,w) both count 3 -> left asc picks (l,o); after
    // merging, (lo,w) counts 3; round 3 is an all-ones tie -> (e,s)
    assert(got == Seq(("l", "o", 3L), ("lo", "w", 3L), ("e", "s", 1L)))
  }

  test("merged symbols pair in later rounds, and equal-symbol runs " +
      "merge leftmost-non-overlapping") {
    val got = TextAnalysis.bpeMerges(corpus("aaaa"), "text", 2)
    // [a,a,a,a]: (a,a) x3 -> fold gives [aa,aa] (NOT [aa,a,a]); then
    // (aa,aa) x1
    assert(got == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("merge strings containing quotes survive (lit columns, not " +
      "SQL splicing)") {
    val got = TextAnalysis.bpeMerges(corpus("d'a d'a"), "text", 2)
    // pairs (d,') and (',a) both x2 -> left asc: ' < d -> (', a);
    // then (d,'a) x2
    assert(got == Seq(("'", "a", 2L), ("d", "'a", 2L)))
  }

  test("merge budget beyond exhaustion stops early instead of " +
      "degenerate argmax") {
    val got = TextAnalysis.bpeMerges(corpus("ab"), "text", 5)
    assert(got == Seq(("a", "b", 1L)))
  }
}
