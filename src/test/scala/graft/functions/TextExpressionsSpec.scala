package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("char_ngrams equals the substr formulation on random strings") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val alphabets = Seq("ab ", "abcdefgh .,", "héöñ×ab", "日本語ab c")
    val samples = (0 until 200).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val len = rng.nextInt(40)
      (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    } :+ "" :+ "x"
    for (k <- Seq(1, 2, 4, 7)) {
      val rows = samples.toDF("s").select(
        TextFunctions.char_ngrams(col("s"), k).as("fast"),
        transform(
          sequence(lit(1), greatest(length(col("s")) - (k - 1), lit(1))),
          i => substr(col("s"), i, lit(k))).as("slow"),
        TextFunctions.char_ngrams(col("s"), k, distinct = true)
          .as("fastd"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
        assert(r.getSeq[String](2) == r.getSeq[String](1).distinct, s"k=$k")
      }
    }
  }

  test("md5_int60 expression is bit-identical to the composed " +
      "md5/substring/conv definition (the DuckDB oracle contract)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val alphabets = Seq("ab ", "abcdefgh .,", "héöñ×ab", "日本語ab c")
    val samples = (0 until 500).map { i =>
      val alpha = alphabets(i % alphabets.length)
      (0 until rng.nextInt(60)).map(_ => alpha(rng.nextInt(alpha.length)))
        .mkString
    } :+ "" :+ "x" :+ ("y" * 4096)
    val rows = samples.toDF("s").select(
      StableHash.md5Int60(col("s")).as("fast"),
      StableHash.md5Int60Composed(col("s")).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    rows.foreach(r => assert(r.getLong(0) >= 0L))
    // null in → null out, matching the composed chain
    val n = Seq[Option[String]](None).toDF("s").select(
      StableHash.md5Int60(col("s")).as("fast"),
      StableHash.md5Int60Composed(col("s")).as("slow")).collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("lang_id_tokens expression equals the composed array_max " +
      "formulation, including ties, empties, nulls and noise") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val vocab = TextAnalysis.LangProfiles.values.flatten.toVector ++
      Vector("xyzzy", "впр", "日本", "data", "spark", "la", "est", "que")
    val rng = new scala.util.Random(11)
    val samples: Seq[Seq[String]] = (0 until 400).map { _ =>
      (0 until rng.nextInt(30)).map(_ => vocab(rng.nextInt(vocab.length)))
    } :+ Seq.empty[String] :+ Seq("the") :+ Seq("la") :+ Seq("xyzzy")
    val rows = samples.toDF("toks").select(
      TextAnalysis.langIdFromTokens(col("toks")).as("fast"),
      TextAnalysis.langIdFromTokensComposed(col("toks")).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // null array → "und" both ways
    val n = Seq[Option[Seq[String]]](None).toDF("toks").select(
      TextAnalysis.langIdFromTokens(col("toks")).as("fast"),
      TextAnalysis.langIdFromTokensComposed(col("toks")).as("slow"))
      .collect().head
    assert(n.getString(0) == "und" && n.getString(1) == "und")
  }

  test("lang_id_tokens is SQL-registered") {
    graft.Graft.install(spark)
    val got = spark.sql(
      "SELECT lang_id_tokens(array('der', 'und', 'die', 'cat'))")
      .collect().head.getString(0)
    assert(got == "de")
    // NULL token array → 'und' on the SQL surface too — same
    // semantics as the Scala Column API's coalesce wrapper
    val nul = spark.sql(
      "SELECT lang_id_tokens(CAST(NULL AS ARRAY<STRING>))")
      .collect().head.getString(0)
    assert(nul == "und")
  }

  test("char_ngrams is SQL-registered with analysis-time checks") {
    graft.Graft.install(spark)
    val got = spark.sql("SELECT char_ngrams('abcde', 4, true)")
      .collect().head.getSeq[String](0)
    assert(got == Seq("abcd", "bcde"))
    // wrong input type fails at analysis, not on executors
    val err = intercept[Exception] {
      spark.sql("SELECT char_ngrams(42, 4)").collect()
    }
    assert(err.getMessage.contains("STRING"))
    // wrong arity is a clean error
    val arity = intercept[Exception] {
      spark.sql("SELECT char_ngrams('x')").collect()
    }
    assert(arity.getMessage.contains("char_ngrams"))
  }
}
