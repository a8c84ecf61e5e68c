package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class BpeIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/tok"

  private def corpus(n: Int = 60) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Seq.fill(3 + i % 3)(s"low lower lowest ab${i % 7}")
        .mkString(" "))
    }.toDF("id", "text")
  }

  test("train once, reuse on the same corpus+budget, rebuild on a " +
      "changed budget; served merges and encode equal the in-plan " +
      "training") {
    val path = tmp("bpe")
    assert(!BpeIndex.buildIfAbsent(corpus(), "text", "id", 3, path).reused)
    assert(BpeIndex.buildIfAbsent(corpus(), "text", "id", 3, path).reused)
    val want = TextAnalysis.bpeMerges(corpus(), "text", 3)
    assert(BpeIndex.merges(spark, path) == want)
    // the persisted encode is bit-for-bit the in-plan encode
    val docs = corpus(80).filter(col("id") >= 60)
    val served = BpeIndex.encodeStats(spark, path, docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val direct = docs.select(col("id"),
        TextAnalysis.bpeEncodeStats(col("text"),
          want.map { case (l, r, _) => (l, r) }).as("e"))
      .select(col("id"), col("e.n_words"), col("e.n_chars"),
        col("e.n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served == direct)
    // a different merge budget is a different tokenizer
    assert(!BpeIndex.buildIfAbsent(corpus(), "text", "id", 2, path).reused)
    assert(BpeIndex.merges(spark, path).length == 2)
    // and a changed corpus rebuilds
    assert(!BpeIndex.buildIfAbsent(corpus(50), "text", "id", 2, path)
      .reused)
  }
}
