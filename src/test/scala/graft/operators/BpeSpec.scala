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

  private def encode(text: String, merges: Seq[(String, String)]) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextAnalysis.bpeEncodeStats(col("text"), merges).as("e"))
      .select(col("e.n_words"), col("e.n_chars"), col("e.n_tokens"))
      .as[(Long, Long, Long)].head()
  }

  test("encode applies merges in training order, chained through " +
      "merged symbols") {
    // low: [l,o,w] -> [lo,w] -> [low]; slow: [s,l,o,w] -> [s,low]
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "s"))
    assert(encode("low slow", m) == ((2L, 7L, 3L)))
  }

  test("encode merges equal-symbol runs leftmost-non-overlapping") {
    val m = Seq(("a", "a"))
    // aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(encode("aaa aaaa", m) == ((2L, 7L, 4L)))
  }

  test("encode of empty and whitespace-only text yields zero counts") {
    val m = Seq(("a", "a"))
    assert(encode("", m) == ((0L, 0L, 0L)))
    assert(encode("   ", m) == ((0L, 0L, 0L)))
  }

  test("encode with no merges returns character counts") {
    assert(encode("ab cde", Nil) == ((2L, 5L, 5L)))
  }

  test("encode merge strings with quotes ride lit columns safely") {
    val m = Seq(("'", "a"), ("d", "'a"))
    // d'a: [d,',a] -> [d,'a] -> [d'a]
    assert(encode("d'a", m) == ((1L, 3L, 1L)))
  }

  private def bothEncodes(texts: Seq[String],
      merges: Seq[(String, String)]) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = texts.toDF("text")
    def run(e: org.apache.spark.sql.Column) =
      df.select(e.as("e"))
        .select(col("e.n_words"), col("e.n_chars"), col("e.n_tokens"))
        .as[(Long, Long, Long)].collect().toSeq
    (run(TextAnalysis.bpeEncodeStats(col("text"), merges)),
      run(TextAnalysis.bpeEncodeStatsComposed(col("text"), merges)))
  }

  test("runtime-codec encode is bit-identical to the composed " +
      "expression fold — merged-string collisions, multibyte text, " +
      "equal-symbol runs") {
    val texts = Seq(
      "low lower lowest slow slowly",
      "aaa aaaa aaaaa baaab",
      "d'a d'ab ab abab ababab xab xxab xyxyx",
      "héllo wörld héllo naïve héé",
      "", "   ", "x")
    // ranks 1 and 3 both PRODUCE the string "xab" via different merge
    // paths — the codec must preserve fold order under the collision
    val m = Seq(("a", "b"), ("x", "ab"), ("x", "a"), ("xa", "b"),
      ("a", "a"), ("é", "l"), ("h", "éé"))
    val (fast, composed) = bothEncodes(texts, m)
    assert(fast == composed)
  }

  test("runtime-codec encode is bit-identical to the composed fold " +
      "on a TRAINED merge table over fuzzed corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def word() =
      (0 until 2 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    val trainTexts =
      (0 until 25).map(_ => (0 until 6).map(_ => word()).mkString(" "))
    // the composed reference EXPANDS ~5 child references per fold
    // layer at Column→Expression conversion (5^n nodes), so its
    // buildable budget is SINGLE-DIGIT merges — exactly the
    // unplannability the runtime codec removes (BpeIndexSpec proves
    // ≥1000 merges through the codec)
    val merges = TextAnalysis
      .bpeMerges(trainTexts.toDF("text"), "text", 6)
      .map { case (l, r, _) => (l, r) }
    val scoreTexts =
      (0 until 15).map(_ => (0 until 6).map(_ => word()).mkString(" "))
    val (fast, composed) = bothEncodes(scoreTexts, merges)
    assert(fast == composed)
  }
}
