package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 60 docs: 20 templated triples (near-dups inside each triple,
  // unrelated across triples) — enough band-key collisions to make
  // every code path fire, small enough to verify exhaustively
  private def corpus(from: Int = 0, until: Int = 60) = {
    import spark.implicits._
    (from until until).map { i =>
      val family = i / 3
      val variant = i % 3 match {
        case 0 => "alpha"
        case 1 => "beta"
        case _ => "alpha" // variant 2 duplicates variant 0's tail word
      }
      (i.toLong, s"${familyBody(family)} end $variant")
    }.toDF("doc_id", "text")
  }

  /** Hash-derived hex tokens: within a family the body is identical,
    * across families the 4-gram overlap is chance-level — patterned
    * tokens like `w14x3q3` vs `w13x3q3` share ~half their grams and
    * make everything a near-dup of everything.
    */
  private def familyBody(family: Int): String =
    (0 until 8).map(j => java.lang.Long.toHexString(
      (family * 1000003L + j) * -0x61c8864680b583ebL)).mkString(" ")

  private val scheme = DedupIndex.MinhashMd5(numHashes = 16, shingle = 4)

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  private def pairKey(df: org.apache.spark.sql.DataFrame,
      a: String, b: String) =
    df.select(col(a), col(b), col("matches"), col("est_jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("screen equals exactDupsOf union (nearDupsOf minus exact), " +
      "each pair once under its strongest label") {
    import spark.implicits._
    val path = tmp("dedupidx-screen")
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8, dbParts = 8)
    // probes: doc 0 copied verbatim (exact), doc 3 with an edit
    // (near of its family), one novel doc
    val probes = corpus(0, 1)
      .select((col("doc_id") + 900).as("doc_id"), col("text"))
      .unionByName(corpus(3, 4)
        .select((col("doc_id") + 900).as("doc_id"),
          concat(col("text"), lit(" edited")).as("text")))
      .unionByName(Seq((999L, "entirely novel content zzz qqq vvv"))
        .toDF("doc_id", "text"))
    val got = DedupIndex.screen(spark, path, probes, "text", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val exact = DedupIndex.exactDupsOf(spark, path, probes, "text",
        "doc_id").select("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val near = DedupIndex.nearDupsOf(spark, path, probes, "text",
        "doc_id", 5).select("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exact.map { case (a, b) => (a, b, "exact") } ++
      (near -- exact).map { case (a, b) => (a, b, "near") }
    assert(got == want)
    // the copy flags exact; the edited one flags near; both nonempty
    assert(got.exists(_._3 == "exact") && got.exists(_._3 == "near"))
    assert(!got.exists(_._1 == 999L))
  }

  test("applyBatch: a replayed mixed insert/delete micro-batch " +
      "applies once in ONE commit; the index equals the sequential " +
      "fold; a same-batch insert+delete of one id refuses") {
    val path = tmp("dedupidx-cdc")
    val wantPath = tmp("dedupidx-cdc-want")
    DedupIndex.buildIfAbsent(corpus(0, 30), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8, dbParts = 8)
    val b0 = corpus(30, 36).withColumn("op", lit("I"))
      .unionByName(corpus(0, 3).withColumn("op", lit("D")))
    val r0 = DedupIndex.applyBatch(b0, 0L, path)
    assert(!r0.reused)
    // at-least-once replay: the whole batch skips
    val replay = DedupIndex.applyBatch(b0, 0L, path)
    assert(replay.reused && replay.fingerprint == r0.fingerprint &&
      replay.count == r0.count)
    // sequential-fold oracle: a fresh survivors-only build
    val want = DedupIndex.buildIfAbsent(corpus(3, 36), "text", "doc_id",
      scheme, bands = 4, wantPath, kbParts = 8, sbParts = 8, dbParts = 8)
    assert(r0.fingerprint == want.fingerprint && r0.count == want.count)
    assert(pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
      == pairKey(DedupIndex.selfPairs(spark, wantPath, 5), "a", "b"))
    // version-blind tombstones: same-batch insert+delete of an id
    // would silently hide the insert — refuse instead
    assert(intercept[IllegalArgumentException] {
      DedupIndex.applyBatch(corpus(40, 41).withColumn("op", lit("I"))
        .unionByName(corpus(40, 41).withColumn("op", lit("D"))),
        1L, path)
    }.getMessage.contains("shared"))
  }

  test("build/reuse: unchanged corpus reuses; edited text rebuilds; " +
      "changed banding rebuilds") {
    val path = tmp("dedupidx")
    val b1 = DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    assert(!b1.reused && b1.count == 60)
    assert(DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8).reused)
    // one character of one doc changes the xor-fold fingerprint
    val edited = corpus().withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("!")))
        .otherwise(col("text")))
    assert(!DedupIndex.buildIfAbsent(edited, "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8).reused)
    // same corpus, different band count: must not reuse
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    assert(!DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 2, path, kbParts = 8, sbParts = 8).reused)
  }

  test("selfPairs from the persisted index equals the in-plan " +
      "signature pipeline verified by hand") {
    val path = tmp("dedupidx-pairs")
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    val got = pairKey(
      DedupIndex.selfPairs(spark, path, thresholdTenths = 5), "a", "b")
    // independent recomputation: permutation signatures in-plan,
    // banded candidates, exact overlap count
    val sigs = Dedup.corpusMinhashSignatures(corpus(), "text", "doc_id",
        scheme.numHashes, scheme.shingle,
        graft.functions.StableHash.md5Int60)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bandOf = (sig: Seq[Long]) =>
      sig.grouped(scheme.numHashes / 4).zipWithIndex
        .map { case (s, j) => (j, s.mkString("|")) }.toSet
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if bandOf(sigs(a)).intersect(bandOf(sigs(b))).nonEmpty
      m = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      if m * 10 >= 5 * scheme.numHashes
    } yield (a, b, m.toLong,
      math.round(m.toDouble / scheme.numHashes * 10000) / 10000.0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("append composes the fingerprint to the full-build value and " +
      "search results are identical to a one-shot index") {
    val path = tmp("dedupidx-app")
    val fullPath = tmp("dedupidx-full")
    DedupIndex.buildIfAbsent(corpus(0, 40), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    val appended = DedupIndex.append(corpus(40, 60), path)
    val full = DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, fullPath, kbParts = 8, sbParts = 8)
    assert(appended.fingerprint == full.fingerprint &&
      appended.count == full.count)
    // the appended index now satisfies a full-corpus rebuild request
    assert(DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8).reused)
    assert(pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b") ==
      pairKey(DedupIndex.selfPairs(spark, fullPath, 5), "a", "b"))
    // appended docs are searchable: doc 42's family is {42, 43, 44}
    val probes = corpus(42, 43)
    val hits = DedupIndex.nearDupsOf(spark, path, probes, "text",
        "doc_id", thresholdTenths = 5)
      .filter(col("new_id") =!= col("corpus_id"))
      .collect().map(_.getLong(1)).toSet
    assert(hits.nonEmpty && hits.subsetOf(Set(43L, 44L)), s"hits=$hits")
  }

  test("nearDupsOf flags new docs against the corpus and misses " +
      "genuinely new content") {
    import spark.implicits._
    val path = tmp("dedupidx-inc")
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    // doc 15 = family 5, variant 0 — replicate its exact text
    val fresh = Seq(
      (1000L, s"${familyBody(5)} end alpha"),
      (1001L, "entirely novel content that matches no indexed " +
        "document in any shingle whatsoever"))
      .toDF("doc_id", "text")
    val flagged = DedupIndex.nearDupsOf(spark, path, fresh, "text",
      "doc_id", thresholdTenths = 5)
    val byProbe = flagged.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(byProbe.getOrElse(1000L, Set.empty[Long]).contains(15L))
    assert(!byProbe.contains(1001L))
  }

  test("torn append is invisible (orphan delta never read) and an " +
      "overlapping append refuses") {
    val path = tmp("dedupidx-torn")
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    val before = pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
    // simulate a crash mid-append: data staged, manifest never written
    corpus(60, 63).withColumn("sb", lit(0))
      .write.parquet(s"$path/deltas/d99/sigs")
    assert(pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
      == before)
    // an append re-containing indexed ids must throw, not corrupt
    val e = intercept[IllegalArgumentException] {
      DedupIndex.append(corpus(10, 12), path)
    }
    assert(e.getMessage.contains("shares"))
  }

  test("exactDupsOf flags byte-identical (post-normalization) " +
      "probes only, including ones landed by append") {
    import spark.implicits._
    val path = tmp("dedupidx-ex")
    DedupIndex.buildIfAbsent(corpus(0, 40), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8, dbParts = 8)
    DedupIndex.append(corpus(40, 60), path)
    val probes = Seq(
      (2000L, s"${familyBody(3)} end beta"), // = doc 10 (family 3 v1)
      (2001L, s"  ${familyBody(17)}   END alpha "), // doc 51 mod ws+case
      (2002L, s"${familyBody(3)} end beta extra")) // near, not exact
      .toDF("doc_id", "text")
    val got = DedupIndex.exactDupsOf(spark, path, probes, "text",
        "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // normText lowercases and collapses whitespace but does NOT trim,
    // so 2001's leading/trailing spaces keep it distinct — only the
    // byte-identical normalized probe matches
    assert(got == Set((2000L, 10L)), s"got=$got")
    val trimmed = Seq((2001L, s"${familyBody(17)} END alpha"))
      .toDF("doc_id", "text")
    // family 17 = {51, 52, 53}; variants 0 and 2 share the "alpha"
    // tail, so 51 and 53 are genuine exact dups of each other — the
    // probe matches both
    assert(DedupIndex.exactDupsOf(spark, path, trimmed, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2001L, 51L), (2001L, 53L)))
  }

  test("delete tombstones docs out of pairs/lookups/exact, composes " +
      "the fingerprint to the survivors-only build, and purge " +
      "re-opens the id space") {
    val path = tmp("dedupidx-del")
    val remPath = tmp("dedupidx-rem")
    DedupIndex.buildIfAbsent(corpus(), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8, dbParts = 8)
    // delete family 4 entirely: {12, 13, 14}
    val dead = corpus(12, 15)
    val del = DedupIndex.delete(dead, path)
    val rem = DedupIndex.buildIfAbsent(
      corpus().filter(col("doc_id") < 12 || col("doc_id") >= 15),
      "text", "doc_id", scheme, bands = 4, remPath,
      kbParts = 8, sbParts = 8, dbParts = 8)
    assert(del.fingerprint == rem.fingerprint && del.count == rem.count)
    val pairs = pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
    assert(pairs == pairKey(DedupIndex.selfPairs(spark, remPath, 5),
      "a", "b"))
    assert(pairs.forall { case (a, b, _, _) =>
      !Set(12L, 13L, 14L)(a) && !Set(12L, 13L, 14L)(b) })
    // lookups no longer see the family: probe with doc 12's text
    val probe = corpus(12, 13)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    assert(DedupIndex.nearDupsOf(spark, path, probe, "text", "doc_id",
      5).count() == 0)
    assert(DedupIndex.exactDupsOf(spark, path, probe, "text", "doc_id")
      .count() == 0)
    // double delete and tombstoned re-add both refuse
    assert(intercept[IllegalArgumentException] {
      DedupIndex.delete(dead, path)
    }.getMessage.contains("not live"))
    assert(intercept[IllegalArgumentException] {
      DedupIndex.append(dead, path)
    }.getMessage.contains("tombstoned"))
    // CONTENT-verified delete: a live id with stale/edited text must
    // refuse — its hash was never folded into the fingerprint
    assert(intercept[IllegalArgumentException] {
      DedupIndex.delete(corpus(0, 2).withColumn("text",
        concat(col("text"), lit("!stale"))), path)
    }.getMessage.contains("differs"))
    // tombstone-growth bound: exceeding it demands a purge
    assert(intercept[IllegalArgumentException] {
      DedupIndex.delete(corpus(0, 3), path, maxTombstones = 4)
    }.getMessage.contains("purge"))
    // purge: results invariant, id space re-opened
    assert(DedupIndex.purge(spark, path) == 3L)
    assert(pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
      == pairs)
    assert(!DedupIndex.append(dead, path).reused)
    assert(DedupIndex.nearDupsOf(spark, path, probe, "text", "doc_id",
      5).count() > 0)
  }

  test("appendBatch is exactly-once (replayed batch skipped) and " +
      "compactDeltas folds without changing results") {
    val path = tmp("dedupidx-bat")
    DedupIndex.buildIfAbsent(corpus(0, 40), "text", "doc_id",
      scheme, bands = 4, path, kbParts = 8, sbParts = 8)
    val b1 = DedupIndex.appendBatch(corpus(40, 50), 0L, path)
    assert(!b1.reused)
    // the at-least-once replay of batch 0 must be a no-op
    val replay = DedupIndex.appendBatch(corpus(40, 50), 0L, path)
    assert(replay.reused && replay.fingerprint == b1.fingerprint)
    DedupIndex.appendBatch(corpus(50, 60), 1L, path)
    val before = pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
    assert(DedupIndex.compactDeltas(spark, path) == 2)
    assert(pairKey(DedupIndex.selfPairs(spark, path, 5), "a", "b")
      == before)
    // post-compaction appends keep working
    assert(!DedupIndex.append(corpus(60, 62), path).reused)
  }
}
