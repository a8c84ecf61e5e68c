package graft.operators

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0L until 200L).map(i =>
      (i, Seq.fill(16)((rnd.nextInt(801) - 400).toLong)))
      .toDF("vec_id", "q")
  }

  private val cents: Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(3)
    Seq.fill(4)(Seq.fill(16)((rnd.nextInt(801) - 400).toLong))
  }

  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { n.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener events post asynchronously; drain before counting
      val deadline = System.currentTimeMillis() + 5000
      var last = -1
      while (System.currentTimeMillis() < deadline && last != n.get()) {
        last = n.get(); Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  test("second build on the same corpus reuses the index: no " +
      "assignment jobs, no rewritten files") {
    val path = Files.createTempDirectory("annidx").toUri.toString.stripSuffix("/") + "/idx"
    val c = corpus().cache()
    c.count()
    val b1 = AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path)
    assert(!b1.reused && b1.count == 200)
    def listing() = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f.getPath -> f.lastModified())
      walk(new java.io.File(path)).sortBy(_._1)
    }
    val before = listing()
    var b2: AnnIndex.Build = null
    val jobs = countJobs { b2 = AnnIndex.buildIfAbsent(c, "q", "vec_id",
      cents, path) }
    assert(b2.reused && b2.fingerprint == b1.fingerprint)
    // only the fingerprint agg may run — never the assignment scan
    // or any write job
    assert(jobs <= 2, s"expected fingerprint-only work, saw $jobs jobs")
    assert(listing() == before, "reused build must not touch the index")
    c.unpersist()
  }

  test("a changed corpus invalidates the fingerprint and rebuilds") {
    val path = Files.createTempDirectory("annidx2").toString + "/idx"
    val c = corpus()
    assert(!AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path).reused)
    val changed = c.withColumn("q",
      when(col("vec_id") === 0, array((0 until 16).map(_ => lit(9L)): _*))
        .otherwise(col("q")))
    val b = AnnIndex.buildIfAbsent(changed, "q", "vec_id", cents, path)
    assert(!b.reused, "modified corpus must rebuild")
  }

  test("incremental append: delta-only writes, composed fingerprint " +
      "equals a full rebuild, searches agree") {
    import spark.implicits._
    val base = corpus().filter(col("vec_id") < 150)
    val delta = corpus().filter(col("vec_id") >= 150)
    val incPath = Files.createTempDirectory("annidx-inc").toString + "/idx"
    val fullPath = Files.createTempDirectory("annidx-full").toString + "/idx"
    AnnIndex.buildIfAbsent(base, "q", "vec_id", cents, incPath)
    def files(sub: String) = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f.getPath -> f.lastModified())
      walk(new java.io.File(s"$incPath/$sub"))
        .filter(_._1.endsWith(".parquet")).sortBy(_._1)
    }
    val baseFiles = files("assignments")
    val appended = AnnIndex.append(delta, incPath)
    // base data files survive untouched — the append stages its rows
    // under deltas/, never inside the base directory
    assert(files("assignments") == baseFiles,
      "append must not touch base bucket files")
    assert(files("deltas").nonEmpty, "append must stage a delta dir")

    val full = AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents,
      fullPath)
    assert(appended.fingerprint == full.fingerprint &&
      appended.count == full.count,
      "composed fingerprint must equal the full-corpus fingerprint")
    // and buildIfAbsent on the full corpus now REUSES the appended idx
    assert(AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents,
      incPath).reused)

    val probes = corpus().filter(col("vec_id").isin(0L, 160L))
      .select(col("vec_id").as("probe_id"), col("q"))
    def res(p: String) =
      AnnIndex.searchInt(spark, p, probes, "probe_id", "q", 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    assert(res(incPath) == res(fullPath))
  }

  test("changed centroid VALUES (same count, same corpus) invalidate " +
      "the manifest and rebuild — no stale-parameter reuse") {
    val path = Files.createTempDirectory("annidx-ph").toString + "/idx"
    val c = corpus()
    assert(!AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path).reused)
    val shifted = cents.map(_.map(_ + 1L))
    assert(!AnnIndex.buildIfAbsent(c, "q", "vec_id", shifted, path).reused,
      "same centroid count with different values must rebuild")
    // and the rebuilt manifest now reuses on the NEW values
    assert(AnnIndex.buildIfAbsent(c, "q", "vec_id", shifted, path).reused)
  }

  test("append with overlapping ids throws instead of silently " +
      "corrupting rows and fingerprint") {
    val path = Files.createTempDirectory("annidx-dis").toString + "/idx"
    AnnIndex.buildIfAbsent(corpus().filter(col("vec_id") < 150),
      "q", "vec_id", cents, path)
    val overlapping = corpus().filter(col("vec_id") >= 140) // 140-149 dupe
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(overlapping, path)
    }
    assert(e.getMessage.contains("id"))
    // a disjoint delta still passes the guard
    AnnIndex.append(corpus().filter(col("vec_id") >= 150), path)
  }

  test("a torn append (staged delta dir, no manifest commit) is " +
      "invisible to search and overwritten by the retry") {
    val path = Files.createTempDirectory("annidx-torn").toString + "/idx"
    val base = corpus().filter(col("vec_id") < 150)
    val delta = corpus().filter(col("vec_id") >= 150)
    AnnIndex.buildIfAbsent(base, "q", "vec_id", cents, path)
    // simulate the crash: stage the delta files by hand where append
    // would, WITHOUT the manifest commit
    import graft.operators.{Ivf => I}
    delta.select(col("vec_id"), col("q"),
        I.assignInt(col("q"), cents).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/deltas/d0")
    val probes = corpus().filter(col("vec_id").isin(0L, 160L))
      .select(col("vec_id").as("probe_id"), col("q"))
    val ids = AnnIndex.searchInt(spark, path, probes, "probe_id", "q", 2, 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ < 150),
      s"uncommitted delta rows leaked into search: $ids")
    // the retry claims a fresh staged name and commits exactly once;
    // the orphan stays unreferenced garbage
    val b = AnnIndex.append(delta, path)
    assert(b.count == 200)
    val after = AnnIndex.searchInt(spark, path, probes, "probe_id", "q",
        2, 3).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(after.exists(_ >= 150), "committed delta must be searchable")
  }

  test("persisted PQ index: reuse skips the encode; search matches " +
      "the in-plan ADC ranking from codes only") {
    val path = Files.createTempDirectory("pqidx").toString + "/idx"
    val c = corpus().cache()
    c.count()
    // 4 subvectors × 3 centroids × width 4 over the 16-dim corpus
    val books: Seq[Seq[Seq[Long]]] = {
      val rnd = new scala.util.Random(11)
      Seq.fill(4)(Seq.fill(3)(Seq.fill(4)((rnd.nextInt(801) - 400).toLong)))
    }
    val b1 = AnnIndex.buildPqIfAbsent(c, "q", "vec_id", books, path)
    assert(!b1.reused)
    val jobs = countJobs {
      assert(AnnIndex.buildPqIfAbsent(c, "q", "vec_id", books, path).reused)
    }
    assert(jobs <= 2, s"expected fingerprint-only work, saw $jobs jobs")
    // round-trip of the codebooks
    assert(AnnIndex.pqCodebooks(spark, path) == books)

    val probes = c.filter(col("vec_id") === 5)
      .select(col("vec_id").as("probe_id"), col("q"))
    val got = AnnIndex.pqSearchInt(spark, path, probes, "probe_id", "q", 4)
    val want = Pq.adcTopK(c, c.filter(col("vec_id") === 5)
        .select(col("vec_id").as("probe_id"), col("q").as("pq")),
      4, books)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "vec_id", "adc", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSeq.sorted
    assert(key(got) == key(want))
    // the search plan must not read the raw vector column — codes only
    val scan = got.queryExecution.executedPlan.toString
    assert(!scan.contains("ReadSchema: struct<vec_id:bigint,q:array"),
      s"search should read codes, not raw vectors:\n$scan")
    c.unpersist()
  }

  test("pqAppend: delta-only encode, composed fingerprint equals a " +
      "full rebuild, ADC search serves base + delta codes") {
    val books: Seq[Seq[Seq[Long]]] = {
      val rnd = new scala.util.Random(11)
      Seq.fill(4)(Seq.fill(3)(Seq.fill(4)((rnd.nextInt(801) - 400).toLong)))
    }
    val incPath = Files.createTempDirectory("pqidx-inc").toString + "/idx"
    val fullPath = Files.createTempDirectory("pqidx-full").toString + "/idx"
    AnnIndex.buildPqIfAbsent(corpus().filter(col("vec_id") < 150),
      "q", "vec_id", books, incPath)
    val appended = AnnIndex.pqAppend(
      corpus().filter(col("vec_id") >= 150), incPath)
    val full = AnnIndex.buildPqIfAbsent(corpus(), "q", "vec_id", books,
      fullPath)
    assert(appended.fingerprint == full.fingerprint &&
      appended.count == full.count)
    // full-corpus rebuild attempt reuses the appended index
    assert(AnnIndex.buildPqIfAbsent(corpus(), "q", "vec_id", books,
      incPath).reused)
    // overlapping ids refuse
    intercept[IllegalArgumentException] {
      AnnIndex.pqAppend(corpus().filter(col("vec_id") >= 190), incPath)
    }
    val probes = corpus().filter(col("vec_id") === 5)
      .select(col("vec_id").as("probe_id"), col("q"))
    def res(p: String) =
      AnnIndex.pqSearchInt(spark, p, probes, "probe_id", "q", 4)
        .select("probe_id", "vec_id", "adc", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
    assert(res(incPath) == res(fullPath))
  }

  test("compactDeltas folds many delta dirs into one; searches are " +
      "unchanged; a fresh append after compaction still works") {
    val path = Files.createTempDirectory("annidx-cpt").toString + "/idx"
    AnnIndex.buildIfAbsent(corpus().filter(col("vec_id") < 100),
      "q", "vec_id", cents, path)
    AnnIndex.append(corpus().filter(
      col("vec_id") >= 100 && col("vec_id") < 150), path)
    AnnIndex.append(corpus().filter(col("vec_id") >= 150), path)
    val probes = corpus().filter(col("vec_id").isin(0L, 120L, 170L))
      .select(col("vec_id").as("probe_id"), col("q"))
    def res() =
      AnnIndex.searchInt(spark, path, probes, "probe_id", "q", 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val before = res()
    assert(AnnIndex.compactDeltas(spark, path) == 2)
    assert(res() == before, "compaction must not change search results")
    // exactly one delta dir remains on disk (old ones GC'd)
    val dirs = Option(new java.io.File(s"$path/deltas").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.length == 1 && dirs.head.startsWith("c"), dirs.toString)
    // idempotent: a second compact has nothing to fold
    assert(AnnIndex.compactDeltas(spark, path) == 0)
    // the composed fingerprint still equals a full build, so a
    // rebuild attempt reuses; and new appends stack on cleanly
    assert(AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents,
      path).reused)
  }

  test("appendBatch is exactly-once: a replayed micro-batch id is " +
      "skipped; a live foreachBatch stream maintains the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("annidx-str").toString + "/idx"
    AnnIndex.buildIfAbsent(corpus().filter(col("vec_id") < 100),
      "q", "vec_id", cents, path)
    // direct-call semantics first: replay of the SAME batch id is a
    // no-op on rows AND fingerprint
    val d1 = corpus().filter(col("vec_id") >= 100 && col("vec_id") < 150)
    val b1 = AnnIndex.appendBatch(d1, 0L, path)
    assert(!b1.reused && b1.count == 150)
    val replay = AnnIndex.appendBatch(d1, 0L, path)
    assert(replay.reused && replay.count == 150 &&
      replay.fingerprint == b1.fingerprint,
      "replayed batch id must not double-append")
    // and a stale id below the watermark is also skipped
    assert(AnnIndex.appendBatch(d1, -1L, path).reused)

    // end-to-end on a FRESH index (its own batch-id sequence): a
    // MemoryStream of new vectors through the sink (Spark 4.1 keeps
    // MemoryStream under execution.streaming.runtime)
    val path2 = Files.createTempDirectory("annidx-str2").toString + "/idx"
    AnnIndex.buildIfAbsent(corpus().filter(col("vec_id") < 150),
      "q", "vec_id", cents, path2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Long])]
    val q = input.toDF().toDF("vec_id", "q")
      .writeStream
      .foreachBatch(AnnIndex.foreachBatchSink(path2))
      .start()
    val tail = corpus().filter(col("vec_id") >= 150).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    input.addData(tail.take(20).toIndexedSeq)
    q.processAllAvailable()
    input.addData(tail.drop(20).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // the streamed index now equals a one-shot full build
    val fullPath = Files.createTempDirectory("annidx-str-full")
      .toString + "/idx"
    val full = AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents,
      fullPath)
    val streamed = AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents,
      path2)
    assert(streamed.reused && streamed.fingerprint == full.fingerprint &&
      streamed.count == 200,
      "streamed appends must converge to the one-shot index state")
    val probes = corpus().filter(col("vec_id").isin(0L, 120L, 170L))
      .select(col("vec_id").as("probe_id"), col("q"))
    def res(p: String) =
      AnnIndex.searchInt(spark, p, probes, "probe_id", "q", 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    assert(res(path2) == res(fullPath))
  }

  test("applyBatch: a replayed mixed insert/delete micro-batch applies " +
      "once in ONE commit; the index equals the sequential fold; a " +
      "same-batch insert+delete of one id refuses") {
    val path = Files.createTempDirectory("annidx-cdc").toUri.toString
      .stripSuffix("/") + "/idx"
    AnnIndex.buildIfAbsent(corpus().filter(col("vec_id") < 150),
      "q", "vec_id", cents, path)
    val b0 = corpus().filter(col("vec_id") >= 150)
      .withColumn("op", lit("I"))
      .unionByName(corpus().filter(col("vec_id") < 10)
        .withColumn("op", lit("D")))
    val r0 = AnnIndex.applyBatch(b0, 0L, path)
    assert(!r0.reused && r0.count == 190)
    val replay = AnnIndex.applyBatch(b0, 0L, path)
    assert(replay.reused && replay.fingerprint == r0.fingerprint &&
      replay.count == r0.count)
    // sequential-fold oracle: survivors-only rebuild reuses
    val survivors = corpus().filter(col("vec_id") >= 10)
    val want = AnnIndex.buildIfAbsent(survivors, "q", "vec_id", cents,
      Files.createTempDirectory("annidx-cdc-want").toString + "/idx")
    assert(r0.fingerprint == want.fingerprint)
    assert(AnnIndex.buildIfAbsent(survivors, "q", "vec_id", cents, path)
      .reused)
    // searches never surface the deleted ids
    val probes = corpus().filter(col("vec_id").isin(20L, 170L))
      .select(col("vec_id").as("probe_id"), col("q"))
    val got = AnnIndex.searchInt(spark, path, probes, "probe_id", "q",
      4, 5).collect().map(_.getLong(1)).toSet
    assert(got.forall(_ >= 10))
    // version-blind tombstones: same-batch insert+delete refuses
    assert(intercept[IllegalArgumentException] {
      AnnIndex.applyBatch(corpus().filter(col("vec_id") === 5)
        .withColumn("op", lit("I"))
        .unionByName(corpus().filter(col("vec_id") === 5)
          .withColumn("op", lit("D"))), 1L, path)
    }.getMessage.contains("shared"))
  }

  test("persisted SQ8 index: build/reuse, append composes the " +
      "fingerprint, search matches the in-plan Sq8.topK ranking") {
    val path = Files.createTempDirectory("sq8idx").toString + "/idx"
    val fullPath = Files.createTempDirectory("sq8idx-full").toString + "/idx"
    assert(!AnnIndex.buildSq8IfAbsent(corpus().filter(col("vec_id") < 150),
      "q", "vec_id", path).reused)
    val appended = AnnIndex.sq8Append(
      corpus().filter(col("vec_id") >= 150), path)
    val full = AnnIndex.buildSq8IfAbsent(corpus(), "q", "vec_id", fullPath)
    assert(appended.fingerprint == full.fingerprint &&
      appended.count == full.count)
    assert(AnnIndex.buildSq8IfAbsent(corpus(), "q", "vec_id", path).reused)
    val probes = corpus().filter(col("vec_id") === 3)
      .select(col("vec_id").as("probe_id"), col("q"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "vec_id", "sq8", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSeq.sorted
    val got = AnnIndex.sq8SearchInt(spark, path, probes, "probe_id", "q", 4)
    val want = Sq8.topK(corpus(),
      corpus().filter(col("vec_id") === 3)
        .select(col("vec_id").as("probe_id"), col("q").as("pq")), 4)
    assert(key(got) == key(want))
    // exactly-once streaming dispatch reaches the sq8 kind too
    val b = AnnIndex.appendBatch(corpus().limit(0), 5L, path)
    assert(b.reused) // empty batch: no-op
  }

  test("filtered ANN: carried metadata columns persist, filter at " +
      "search time, and are fingerprinted (metadata edits rebuild)") {
    val path = Files.createTempDirectory("annidx-meta").toString + "/idx"
    val c = corpus().withColumn("par",
      when(pmod(col("vec_id"), lit(2)) === 0, "even").otherwise("odd"))
    val b1 = AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path,
      carryCols = Seq("par"))
    assert(!b1.reused)
    // same (id, vec) with different metadata must NOT reuse
    val edited = c.withColumn("par", lit("all"))
    assert(!AnnIndex.buildIfAbsent(edited, "q", "vec_id", cents, path,
      carryCols = Seq("par")).reused,
      "metadata change must invalidate the fingerprint")
    // rebuild with the original metadata for the search check
    AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path,
      carryCols = Seq("par"))
    val probes = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("q"))
    val got = AnnIndex.searchInt(spark, path, probes, "probe_id", "q",
        nprobe = 4, k = 3, where = Some(col("par") === "even"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got.forall { case (_, id) => id % 2 == 0 },
      s"filtered search must only rank matching candidates: $got")
    // differential vs an nprobe=all unfiltered search trimmed to even
    // ids then re-ranked: with all buckets probed both see the same
    // candidate set, so top-3 evens must agree
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
    val all = AnnIndex.searchInt(spark, path, probes, "probe_id", "q",
        nprobe = 4, k = 200)
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == all)
  }

  test("delete tombstones rows out of every read path, composes the " +
      "fingerprint to the remaining-corpus build, and purge makes a " +
      "clean versioned base") {
    val path = Files.createTempDirectory("annidx-del").toString + "/idx"
    val remPath = Files.createTempDirectory("annidx-rem").toString + "/idx"
    AnnIndex.buildIfAbsent(corpus(), "q", "vec_id", cents, path)
    val dead = corpus().filter(pmod(col("vec_id"), lit(7)) === 3)
    val deleted = AnnIndex.delete(dead, path)
    // fingerprint/count now equal a fresh build over the survivors
    val remaining = corpus().filter(pmod(col("vec_id"), lit(7)) =!= 3)
    val rem = AnnIndex.buildIfAbsent(remaining, "q", "vec_id", cents,
      remPath)
    assert(deleted.fingerprint == rem.fingerprint &&
      deleted.count == rem.count)
    // ...so a rebuild request over the survivors REUSES the index
    assert(AnnIndex.buildIfAbsent(remaining, "q", "vec_id", cents,
      path).reused)
    // searches never surface a tombstoned id, and match the
    // survivors-only index exactly
    val probes = corpus().filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("q"))
    def res(p: String) =
      AnnIndex.searchInt(spark, p, probes, "probe_id", "q", 4, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
    val afterDelete = res(path)
    assert(afterDelete == res(remPath))
    assert(afterDelete.forall { case (_, id, _) => id % 7 != 3 })
    // double delete refuses (ids no longer live)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.delete(dead.limit(3), path)
    }
    assert(e.getMessage.contains("not live"))
    // re-adding a tombstoned id refuses under checkDisjoint
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.append(dead.limit(2), path)
    }
    assert(e2.getMessage.contains("tombstoned"))
    // CONTENT-verified delete: a live id with a stale/edited vector
    // refuses — its hash was never folded into the fingerprint
    assert(intercept[IllegalArgumentException] {
      AnnIndex.delete(remaining.limit(2).withColumn("q",
        transform(col("q"), v => v + 1L)), path)
    }.getMessage.contains("differ"))
    // tombstone-growth bound: exceeding it demands a purge
    assert(intercept[IllegalArgumentException] {
      AnnIndex.delete(remaining.limit(3), path, maxTombstones = 4)
    }.getMessage.contains("purge"))
    // purge rewrites the live rows into a versioned base, clears
    // tombstones, and changes no result
    val purged = AnnIndex.purge(spark, path)
    assert(purged == dead.count())
    assert(res(path) == afterDelete)
    // the id is insertable again after purge, and append composes
    AnnIndex.append(dead.limit(1), path)
    assert(res(path).nonEmpty)
  }

  test("delete works on pq and sq8 indexes through the same " +
      "full-row CDC contract") {
    val pqPath = Files.createTempDirectory("annidx-delpq").toString + "/idx"
    val books = {
      val rnd = new scala.util.Random(11)
      Seq.fill(4)(Seq.fill(4)(Seq.fill(4)((rnd.nextInt(801) - 400).toLong)))
    }
    AnnIndex.buildPqIfAbsent(corpus(), "q", "vec_id", books, pqPath)
    val dead = corpus().filter(col("vec_id") >= 150)
    val del = AnnIndex.delete(dead, pqPath)
    val rem = AnnIndex.buildPqIfAbsent(
      corpus().filter(col("vec_id") < 150), "q", "vec_id", books,
      Files.createTempDirectory("annidx-rempq").toString + "/idx")
    assert(del.fingerprint == rem.fingerprint && del.count == 150)
    val probes = corpus().filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("q"))
    val ids = AnnIndex.pqSearchInt(spark, pqPath, probes, "probe_id",
      "q", 10).collect().map(_.getLong(1))
    assert(ids.nonEmpty && ids.forall(_ < 150))
    // sq8: same discipline
    val sqPath = Files.createTempDirectory("annidx-delsq").toString + "/idx"
    AnnIndex.buildSq8IfAbsent(corpus(), "q", "vec_id", sqPath)
    AnnIndex.delete(dead, sqPath)
    val sq = AnnIndex.sq8SearchInt(spark, sqPath, probes, "probe_id",
      "q", 10).collect().map(_.getLong(1))
    assert(sq.nonEmpty && sq.forall(_ < 150))
  }

  test("persisted search matches the in-plan IVF composition and " +
      "prunes to the probed bucket partitions") {
    val path = Files.createTempDirectory("annidx3").toString + "/idx"
    val c = corpus()
    AnnIndex.buildIfAbsent(c, "q", "vec_id", cents, path)
    val probes = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("q"))
    val got = AnnIndex.searchInt(spark, path, probes, "probe_id", "q",
      nprobe = 2, k = 3)

    // in-plan reference: q46's composition over the same corpus
    val assigned = c.withColumn("bucket", Ivf.assignInt(col("q"), cents))
    val p = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        explode(Ivf.probeBucketsInt(col("q"), cents, 2)).as("bucket"))
    val want = Similarity.topKPerProbe(
      assigned.join(broadcast(p), Seq("bucket"))
        .withColumn("sim", Similarity.cosineInt(col("q"), col("pq"))),
      3, "probe_id", "vec_id")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "vec_id", "sim", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    assert(key(got) == key(want))

    // the probed-bucket filter must reach the file source as a
    // partition filter (static prune — the 100 TB contract)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"),
      s"expected a bucket partition filter in:\n$plan")
  }
}
