package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Bit-parity of the token-statistics expressions against their
  * composed Column-algebra references — tokenizer edges included:
  * every Java `\s` separator class member, non-breaking space as a
  * NON-separator, multibyte tokens, empty and null inputs.
  */
class TokenExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rng = new scala.util.Random(31)
  private val vocab = TextAnalysis.EnStopwords ++ Seq("data", "spark",
    "DATA", "héllo", "日本語", "a", "b,c", "x.y", "the", "the", "und")
  private val seps = Seq(" ", "  ", "\t", "\n", "\r\n", "", "\f",
    " ") // NBSP is NOT \s: it glues two words into one token

  private def randText(): String = {
    val n = rng.nextInt(40)
    (0 until n).map(_ => vocab(rng.nextInt(vocab.length)))
      .mkString(seps(rng.nextInt(seps.length)))
  }

  private def samples: Seq[String] =
    (0 until 300).map(_ => randText()) ++
      Seq("", " ", "\t\n\r", "one", " lead", "trail ", "a  b")

  test("token_stats equals the composed count / mean-length / " +
      "hit-ratio chains") {
    import spark.implicits._
    val rows = samples.toDF("t").select(
      TextAnalysis.tokenCount(col("t")).as("fc"),
      TextAnalysis.tokenCountComposed(col("t")).as("sc"),
      TextAnalysis.meanTokenLen(col("t")).as("fm"),
      TextAnalysis.meanTokenLenComposed(col("t")).as("sm"),
      TextAnalysis.wordHitRatio(col("t"), TextAnalysis.EnStopwords)
        .as("fh"),
      TextAnalysis.wordHitRatioComposed(col("t"), TextAnalysis.EnStopwords)
        .as("sh"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0)
      assert(java.lang.Double.compare(r.getDouble(4), r.getDouble(5)) == 0)
    }
    // null text: count null, ratios collapse to 0.0 — both ways
    val n = Seq[Option[String]](None).toDF("t").select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.tokenCountComposed(col("t")),
      TextAnalysis.meanTokenLen(col("t")),
      TextAnalysis.meanTokenLenComposed(col("t"))).collect().head
    assert(n.isNullAt(0) == n.isNullAt(1))
    assert(java.lang.Double.compare(n.getDouble(2), n.getDouble(3)) == 0)
  }

  test("top_token_fraction / dup_ngram_fraction / token_entropy equal " +
      "their composed O(distinct x tokens) references") {
    import spark.implicits._
    val df = samples.toDF("t")
      .select(col("t"), TextAnalysis.tokens(lower(col("t"))).as("toks"))
    val rows = df.select(
      TextAnalysis.topWordFractionFromTokens(col("toks")).as("f1"),
      TextAnalysis.topWordFractionFromTokensComposed(col("toks")).as("s1"),
      TextAnalysis.dupNgramFractionFromTokens(col("toks"), 2).as("f2"),
      TextAnalysis.dupNgramFractionFromTokensComposed(col("toks"), 2)
        .as("s2"),
      TextAnalysis.dupNgramFractionFromTokens(col("toks"), 3).as("f3"),
      TextAnalysis.dupNgramFractionFromTokensComposed(col("toks"), 3)
        .as("s3"),
      TextAnalysis.tokenEntropy(col("t")).as("f4"),
      TextAnalysis.tokenEntropyComposed(col("t")).as("s4"))
      .collect()
    rows.foreach { r =>
      for (i <- Seq(0, 2, 4, 6))
        assert(
          java.lang.Double.compare(r.getDouble(i), r.getDouble(i + 1)) == 0,
          s"col $i: ${r.getDouble(i)} != ${r.getDouble(i + 1)}")
    }
  }

  test("the one-pass signals stay linear on a pathological doc the " +
      "composed shape cannot handle") {
    import spark.implicits._
    // 60k tokens, 30k distinct: the composed O(distinct x tokens)
    // rescan would be ~1.8e9 comparisons PER ROW; the expressions
    // hash-count in one pass
    val big = (0 until 60000).map(i => s"w${i % 30000}").mkString(" ")
    val got = Seq(big).toDF("t")
      .select(col("t"), TextAnalysis.tokens(lower(col("t"))).as("toks"))
      .select(
        TextAnalysis.topWordFractionFromTokens(col("toks")).as("twf"),
        TextAnalysis.dupNgramFractionFromTokens(col("toks"), 2).as("dnf"),
        TextAnalysis.tokenEntropy(col("t")).as("h"),
        TextAnalysis.tokenCount(col("t")).as("n"))
      .collect().head
    assert(got.getInt(3) == 60000)
    assert(math.abs(got.getDouble(0) - 2.0 / 60000) < 1e-12)
    // every token appears exactly twice -> entropy = log2(30000)
    assert(math.abs(got.getDouble(2) -
      math.log(30000.0) / math.log(2.0)) < 1e-9)
  }
}
