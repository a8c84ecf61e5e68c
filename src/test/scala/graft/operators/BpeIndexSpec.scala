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

  /** Plain-Scala sequential fold — the independent oracle for merge
    * budgets where the composed expression is unplannable.
    */
  private def encodeLocal(w: String,
      merges: Seq[(String, String)]): Int = {
    var syms = w.map(_.toString).toVector
    for ((l, r) <- merges if syms.length > 1) {
      val out = scala.collection.mutable.ArrayBuffer(syms.head)
      for (x <- syms.tail) {
        if (out.last == l && x == r) out(out.length - 1) = l + r
        else out += x
      }
      syms = out.toVector
    }
    syms.length
  }

  test("a real tokenizer budget serves: >= 1000 trained merges encode " +
      "through ONE plan node, values matching the sequential fold " +
      "(the composed per-merge expression is unplannable here)") {
    val path = tmp("bpe-big")
    import spark.implicits._
    // ~200 distinct 12-char words: pair capacity well past the merge
    // budget, so training never exhausts before 1000 rounds
    val rnd = new scala.util.Random(11)
    val words = Iterator
      .continually((0 until 12)
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .take(400).toSeq.distinct.take(200)
    val train = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    BpeIndex.buildIfAbsent(train, "text", "id", 1000, path)
    val merges = BpeIndex.merges(spark, path)
      .map { case (l, r, _) => (l, r) }
    assert(merges.length >= 1000, s"trained only ${merges.length}")
    // encode a probe batch through the persisted artifact: must PLAN
    // (one projection node at this budget) and match the local fold
    val probeWords = words.take(12) ++
      Seq("zzzz", words.head + words(1))
    val probe = probeWords.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = BpeIndex.encodeStats(spark, path, probe, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = probeWords.zipWithIndex.map { case (w, i) =>
      i.toLong -> encodeLocal(w.toLowerCase, merges).toLong
    }.toMap
    assert(got == want)
  }
}
