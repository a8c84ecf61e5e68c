package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Fuzzy.editDistanceJoin vs the naive all-pairs baseline: the
  * q-gram + length-window candidate generation must be LOSSLESS
  * (the Gravano count-filter bound), including tiny strings below
  * the gram width and short-short pairs sharing zero grams.
  */
class FuzzySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def check(strs: Seq[String], k: Int, q: Int = 2,
      maxBucket: Int = 1024): Unit = {
    import spark.implicits._
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("sid", "sv")
    val got = Fuzzy.editDistanceJoin(df, "sv", "sid", k, q, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val want = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = levenshtein(strs(i), strs(j)) if d <= k
    } yield (i.toLong, j.toLong, d.toLong)).sorted
    assert(got === want, s"k=$k q=$q maxBucket=$maxBucket")
  }

  test("random mixed-length strings match the naive baseline") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    val strs = (0 until 120).map { _ =>
      val n = rnd.nextInt(12) // 0..11, includes empty and tiny
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    check(strs, k = 2)
    check(strs, k = 1)
    check(strs, k = 0)
  }

  test("short-short pairs sharing zero grams are still found") {
    // "ab" -> "cd" is distance 2 with no common 2-gram
    check(Seq("ab", "cd", "", "x", "abcd", "dcba"), k = 2)
  }

  test("typo families over realistic names, q=3") {
    val base = Seq("jonathan smith", "johnathan smith", "jon smith",
      "jonathan smyth", "bob jones", "rob jones", "bobby jones")
    check(base, k = 2, q = 3)
  }

  /** The skew guard: a gram in >50% of rows must not quadratic-blow
    * one shuffle bucket, and degrading it to the length-window
    * fallback must stay LOSSLESS.
    */
  test("hot gram (>50% of rows) stays lossless under the skew guard") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh"
    // 60% of rows share the hot bigram "zz"; lengths spread 4..23 so
    // the fallback's length windows genuinely partition the hot set
    val strs = (0 until 100).map { i =>
      val n = 4 + rnd.nextInt(20)
      val s = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString
      if (i % 5 < 3) s"zz$s" else s
    }
    check(strs, k = 1, maxBucket = 8)
    check(strs, k = 2, maxBucket = 8)
  }

  test("guarded candidate count is bounded, not all-pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefgh"
    val strs = (0 until 100).map { i =>
      val n = 4 + rnd.nextInt(20)
      val s = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString
      if (i % 2 == 0) s"zz$s" else s
    }
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("sid", "sv")
    val n = strs.size.toLong
    val allPairs = n * (n - 1) / 2
    val guarded = Fuzzy.candidatePairs(df, "sv", "sid",
      maxDist = 1, q = 2, maxBucket = 8).count()
    // hot rows pair only within ±1-length windows (lengths spread
    // over ~20 values), rare grams only within the positional
    // window: nowhere near the cross product
    assert(guarded < allPairs / 4, s"guarded=$guarded all=$allPairs")
  }
}
