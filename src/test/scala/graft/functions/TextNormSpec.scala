package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.TextNormFunctions._

/** TextNorm expressions: composition, compatibility folding, accent
  * stripping \u2014 asserted with explicit \u escapes (no source-encoding
  * ambiguity). The expressions run inside whole-stage codegen in a
  * select, so both eval paths are exercised.
  */
class TextNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val acute = "\u0301" // combining acute
  private val eAcuteComposed = "\u00e9" // \u00e9
  private val nTildeComposed = "\u00f1" // \u00f1

  private def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): String = {
    import spark.implicits._
    Seq(in).toDF("s").select(f(col("s"))).head.getString(0)
  }

  test("NFC composes combining sequences") {
    assert(run(nfc_normalize(_), "e" + acute) === eAcuteComposed)
    assert(run(nfc_normalize(_), "n\u0303") === nTildeComposed)
    assert(run(nfc_normalize(_), "plain ascii") === "plain ascii")
    // already-composed input is a fixpoint
    assert(run(nfc_normalize(_), eAcuteComposed) === eAcuteComposed)
  }

  test("NFKC additionally folds compatibility forms") {
    assert(run(nfkc_normalize(_), "\ufb01re") === "fire") // fi ligature
    assert(run(nfkc_normalize(_), "\uff26\uff55\uff4c\uff4c") === "Full")
    assert(run(nfkc_normalize(_), "x\u00b2") === "x2") // superscript 2
  }

  test("strip_accents folds to base letters for either input form") {
    assert(run(strip_accents(_), "s\u00f6t \u00e9 na\u00efve")
      === "sot e naive")
    assert(run(strip_accents(_), "e" + acute) === "e") // decomposed input
    assert(run(strip_accents(_), "\u00f1 \u00dc \u00e7") === "n U c")
  }

  test("the SQL registrations mirror the Column API") {
    // same builders GraftExtensions injects at session creation
    graft.plans.GraftExtensions.registerSqlFunctions(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('e\u0301'), strip_accents('s\u00f6t'), " +
        "nfkc_normalize('\ufb01re')").head
    assert(r.getString(0) === "\u00e9")
    assert(r.getString(1) === "sot")
    assert(r.getString(2) === "fire")
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(nfc_normalize(col("s")), strip_accents(col("s"))).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
