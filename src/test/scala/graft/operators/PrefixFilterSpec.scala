package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** prefixFilterJoin (Dedup.scala): exact AllPairs set-similarity
  * self-join. The pinned law is COMPLETENESS — the prefix filter may
  * never lose a qualifying pair — checked against a plain-Scala
  * brute force over every pair, on a corpus built to stress the
  * filter: clone families, partial overlaps straddling the 0.6
  * threshold, disjoint docs sharing only hyper-frequent tokens, and
  * sub-shingle-length docs.
  */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def shingles(text: String, k: Int): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < k) Set.empty
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], tauT: Int, k: Int) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta, k); sb = shingles(tb, k)
      ni = (sa & sb).size; nu = (sa | sb).size
      if nu > 0 && ni * 10 >= tauT * nu
    } yield (ia, ib, ni, nu)).toSet

  // 40 words cycled with per-doc mutations: clones, near-clones at
  // varying edit depth, and unrelated-but-common-token docs
  private val base = (0 until 40).map(i => s"w${i % 13}").mkString(" ")
  private val docs: Seq[(Long, String)] =
    Seq[(Long, String)]((0L, base), (1L, base), // exact clones
      (2L, base.replace("w3", "x")),            // near clone
      (3L, base.split(" ").drop(8).mkString(" ")), // suffix overlap
      (4L, base.split(" ").take(12).mkString(" ")), // prefix overlap
      (5L, (0 until 40).map(i => s"z$i").mkString(" ")), // disjoint
      (6L, "w1 w2"), (7L, ""),                  // below shingle len
      (8L, (0 until 40).map(i => s"w${(i * 7) % 13}").mkString(" "))
    ) ++ (9L until 25L).map(i =>
      (i, (0 until 30).map(j => s"w${(j + i) % 13}").mkString(" ")))

  test("matches plain-Scala brute force exactly (tau=0.6, k=3)") {
    val got = Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"),
        "text", "doc_id", tauTenths = 6, shingle = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    val want = brute(docs, 6, 3)
    assert(got == want)
    assert(want.nonEmpty, "corpus must actually produce pairs")
  }

  test("tau=1.0 returns exactly the identical-set pairs") {
    val got = Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"),
        "text", "doc_id", tauTenths = 10, shingle = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(docs, 10, 3).map(p => (p._1, p._2)))
    assert(got.contains((0L, 1L)))
  }

  test("shingle window longer than every doc yields no pairs") {
    val out = Dedup.prefixFilterJoin(
      Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"),
      "text", "doc_id", tauTenths = 6, shingle = 3)
    assert(out.count() == 0)
  }

  test("randomized corpora match brute force at several thresholds") {
    // seeded LCG -> reproducible corpora with heavy token reuse (the
    // adversarial case for prefix filtering: many shared shingles)
    var seed = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (tau <- Seq(5, 7, 9)) {
      val corpus = (0L until 30L).map { i =>
        val len = 6 + next(25)
        (i, (0 until len).map(_ => s"t${next(9)}").mkString(" "))
      }
      val got = Dedup.prefixFilterJoin(corpus.toDF("doc_id", "text"),
          "text", "doc_id", tauTenths = tau, shingle = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
      assert(got == brute(corpus, tau, 2), s"tau=$tau")
    }
  }

  test("invalid threshold rejected") {
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"),
        "text", "doc_id", tauTenths = 0)
    }
    assert(e.getMessage.contains("tauTenths"))
  }
}
