package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Dedup.dropRepeatedSpans]] — cross-document repeated-substring
  * removal, checked against a driver-side brute force of the same
  * rule: a token is dropped iff it is covered by some duplicated
  * l-window occurrence that is not that window's first (min doc,
  * pos) occurrence.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def brute(docs: Seq[(Long, String)], l: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      p <- 0 to ts.length - l
      if ts.length >= l
    } yield (ts.slice(p, p + l).mkString(" "), id, p)
    val canon = occ.groupBy(_._1).filter(_._2.length > 1)
      .map { case (g, os) => g -> os.map(o => (o._2, o._3)).min }
    val marked = occ.flatMap { case (g, id, p) =>
      canon.get(g) match {
        case Some(c) if c != ((id, p)) => (p until p + l).map(id -> _)
        case _ => Seq.empty
      }
    }.toSet
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.filterNot { case (_, i) => marked(id -> i) }
      id -> (ts.length.toLong,
        ts.indices.count(i => marked(id -> i)).toLong,
        kept.map(_._1).mkString(" "))
    }
  }

  private def run(docs: Seq[(Long, String)], l: Int)
      : Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.dropRepeatedSpans(docs.toDF("doc_id", "text"), "text",
      "doc_id", l)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3)))
      .toMap
  }

  test("matches brute force on a crafted corpus: cross-doc, " +
      "within-doc, overlapping, and short docs") {
    val docs = Seq(
      // 0 and 1 share a 4-token passage; 0 is canonical (first)
      (0L, "a b c d e f g"),
      (1L, "x y a b c d z"),
      // 2 repeats a window WITHIN itself (second occurrence drops)
      (2L, "p q r s p q r s"),
      // 3 too short for any window
      (3L, "one two"),
      // 4 shares with both 0 and 1 (transitively overlapping spans)
      (4L, "b c d e f h i"),
      // 5 whitespace runs normalize
      (5L, "  a   b c d   e  "))
    val want = brute(docs, 4)
    val got = run(docs, 4)
    assert(got == want)
    // sanity on the semantics themselves, not just the differential:
    // doc 0 keeps everything (canonical), doc 1 loses "a b c d"
    assert(got(0L)._3 == "a b c d e f g")
    assert(got(1L)._2 == 4)
    // within-doc: the second "p q r s" drops
    assert(got(2L)._3 == "p q r s")
  }

  test("matches brute force on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 40L).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    assert(run(docs, 5) == brute(docs, 5))
  }

  test("no duplicated windows → corpus passes through intact") {
    val docs = Seq((0L, "u v w x y"), (1L, "m n o p q"))
    val got = run(docs, 3)
    assert(got(0L) == ((5L, 0L, "u v w x y")))
    assert(got(1L) == ((5L, 0L, "m n o p q")))
  }
}
