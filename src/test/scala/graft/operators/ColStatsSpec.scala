package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The persisted column-statistics artifact: exact scalar profile,
  * cross-checked HLL registers, append-only monotone algebra with
  * honest delete refusal, exactly-once CDC, compaction invariance,
  * and uncoordinated-writer convergence.
  */
class ColStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  /** (id, v BIGINT nullable, s STRING) — v null on %7 == 0. */
  private def rows(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toLong,
        if (i % 7 == 0) None else Some((i * 13 % 40).toLong),
        s"s${i % 9}")
    }.toDF("id", "v", "s")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).toSet

  test("built profile equals direct per-column aggregates, nulls " +
      "and string extrema included") {
    val path = tmp("colstats")
    val t = rows(0, 80)
    ColStats.buildIfAbsent(t, Seq("id", "v"), Seq("s"), path)
    val got = ColStats.stats(spark, path).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "v", "s"))
    val v = got("v")
    assert(v.getAs[Long]("n_rows") == 80)
    assert(v.getAs[Long]("n_nulls") ==
      t.filter(col("v").isNull).count())
    val direct = t.agg(min("v"), max("v"), sum("v")).head()
    assert(v.getAs[Long]("min_num") == direct.getLong(0) &&
      v.getAs[Long]("max_num") == direct.getLong(1) &&
      v.getAs[Long]("sum_num") == direct.getLong(2))
    val s = got("s")
    assert(s.getAs[Long]("n_nulls") == 0 &&
      s.getAs[String]("min_str") == "s0" &&
      s.getAs[String]("max_str") == "s8")
    assert(s.get(s.fieldIndex("min_num")) == null)
    assert(v.get(v.fieldIndex("min_str")) == null)
  }

  test("registers equal Hll.registers over the rendered value " +
      "stream, per column; ndv lands near the true distinct count") {
    val path = tmp("colstats-regs")
    val t = rows(0, 120)
    ColStats.buildIfAbsent(t, Seq("id"), Seq("s"), path)
    val got = ColStats.registers(spark, path)
    for ((c, render) <- Seq(
        ("id", col("id").cast("long").cast("string")),
        ("s", col("s")))) {
      val want = Hll.registers(
        t.select(render.as("t")).filter(col("t").isNotNull),
        "t", bucketBits = 6, Hll.md5Hash, hashBits = 60)
      assert(rowsOf(got.filter(col("col_name") === c)
          .select("bucket", "register")) == rowsOf(want),
        s"register mismatch for column $c")
    }
    val ndv = ColStats.ndv(spark, path).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ndv("id") - 120) / 120.0 < 0.5)
    assert(math.abs(ndv("s") - 9) / 9.0 < 0.5)
  }

  test("histogram equals direct signed-log2 bucket counts (negatives " +
      "and zero included); quantile estimates land in the bucket that " +
      "contains the exact quantile") {
    import spark.implicits._
    val path = tmp("colstats-hist")
    // w spans negative / zero / positive magnitudes
    val t = (0 until 300).map(i => (i.toLong, (i - 150).toLong * 3))
      .toDF("id", "w")
    ColStats.buildIfAbsent(t, Seq("id", "w"), Nil, path)
    val direct = t
      .select(explode(array(
        struct(lit("id").as("c"), col("id").as("v")),
        struct(lit("w").as("c"), col("w").as("v")))).as("e"))
      .select(col("e.c").as("col_name"),
        when(col("e.v") === 0, 0)
          .when(col("e.v") > 0, length(bin(col("e.v"))).cast("int"))
          .otherwise(-length(bin(-col("e.v"))).cast("int"))
          .as("bucket"))
      .groupBy("col_name", "bucket").agg(count(lit(1)).as("cnt"))
    assert(rowsOf(ColStats.hist(spark, path)) == rowsOf(direct))
    // every histogram count is a sum → appends fold exactly
    val inc = tmp("colstats-hist-inc")
    ColStats.buildIfAbsent(t.filter(col("id") < 100),
      Seq("id", "w"), Nil, inc)
    ColStats.append(t.filter(col("id") >= 100), inc)
    assert(rowsOf(ColStats.hist(spark, inc)) == rowsOf(direct))
    // quantiles: the exact quantile value must fall inside the
    // chosen bucket's range (the histogram is exact, the estimate
    // is just the midpoint)
    val qs = Seq(0.1, 0.5, 0.9)
    val got = ColStats.quantiles(spark, path, qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        r.getInt(r.fieldIndex("bucket"))).toMap
    assert(got.size == 2 * qs.size)
    for (q <- qs; (cn, vals) <- Seq(
        ("id", (0 until 300).map(_.toLong)),
        ("w", (0 until 300).map(i => (i - 150).toLong * 3)))) {
      val sorted = vals.sorted
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val b = got((cn, q))
      val (lo, hi) =
        if (b == 0) (0L, 0L)
        else if (b > 0) (1L << (b - 1), (1L << b) - 1)
        else (-((1L << -b) - 1), -(1L << (-b - 1)))
      assert(exact >= lo && exact <= hi,
        s"$cn q=$q exact=$exact outside bucket $b [$lo,$hi]")
    }
  }

  test("append composes: stats, registers, and fingerprint equal " +
      "the one-shot build over the union; second build reuses") {
    val (inc, once) = (tmp("colstats-inc"), tmp("colstats-once"))
    ColStats.buildIfAbsent(rows(0, 60), Seq("id", "v"), Seq("s"), inc)
    ColStats.append(rows(60, 100), inc)
    ColStats.append(rows(100, 130), inc)
    val b = ColStats.buildIfAbsent(rows(0, 130), Seq("id", "v"),
      Seq("s"), once)
    assert(rowsOf(ColStats.stats(spark, inc)) ==
      rowsOf(ColStats.stats(spark, once)))
    assert(rowsOf(ColStats.registers(spark, inc)) ==
      rowsOf(ColStats.registers(spark, once)))
    // composed fingerprint == one-shot fingerprint → the incremental
    // artifact REUSES against the union build
    val again = ColStats.buildIfAbsent(rows(0, 130), Seq("id", "v"),
      Seq("s"), inc)
    assert(again.reused && again.fingerprint == b.fingerprint)
  }

  test("deletes refuse (monotone stats can't retract); a CDC batch " +
      "containing any delete refuses atomically") {
    val path = tmp("colstats-del")
    ColStats.buildIfAbsent(rows(0, 40), Seq("id", "v"), Seq("s"), path)
    intercept[UnsupportedOperationException](
      ColStats.delete(rows(0, 5), path))
    val before = rowsOf(ColStats.stats(spark, path))
    val mixed = rows(40, 45).withColumn("op", lit("I"))
      .unionByName(rows(0, 2).withColumn("op", lit("D")))
    intercept[UnsupportedOperationException](
      ColStats.applyBatch(mixed, 0L, path))
    // nothing staged, nothing applied — the refusal is atomic
    assert(rowsOf(ColStats.stats(spark, path)) == before)
    assert(IndexPipeline.lastBatch(path) == -1L)
  }

  test("appendBatch is exactly-once per batch id; compaction folds " +
      "deltas without changing the served profile") {
    val path = tmp("colstats-batch")
    ColStats.buildIfAbsent(rows(0, 40), Seq("id", "v"), Seq("s"), path)
    assert(!ColStats.appendBatch(rows(40, 60), 0L, path).reused)
    // the replay skips
    assert(ColStats.appendBatch(rows(40, 60), 0L, path).reused)
    assert(!ColStats.appendBatch(rows(60, 70), 1L, path).reused)
    val before = rowsOf(ColStats.stats(spark, path))
    val regsBefore = rowsOf(ColStats.registers(spark, path))
    val histBefore = rowsOf(ColStats.hist(spark, path))
    assert(ColStats.compactDeltas(spark, path) == 2)
    assert(rowsOf(ColStats.stats(spark, path)) == before)
    assert(rowsOf(ColStats.registers(spark, path)) == regsBefore)
    assert(rowsOf(ColStats.hist(spark, path)) == histBefore)
  }

  test("4 uncoordinated concurrent appends all land exactly once " +
      "(commit-retry liveness) — profile equals the sequential fold") {
    val path = tmp("colstats-conc")
    ColStats.buildIfAbsent(rows(0, 20), Seq("id", "v"), Seq("s"), path)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 4).map { i =>
      new Thread(() =>
        try { ColStats.append(rows(20 + i * 10, 30 + i * 10), path); () }
        catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent append failed: ${errs.peek()}")
    val once = tmp("colstats-conc-w")
    ColStats.buildIfAbsent(rows(0, 60), Seq("id", "v"), Seq("s"), once)
    assert(rowsOf(ColStats.stats(spark, path)) ==
      rowsOf(ColStats.stats(spark, once)))
    assert(ColStats.buildIfAbsent(rows(0, 60), Seq("id", "v"),
      Seq("s"), path).reused)
  }

  test("the colstats SQL source serves stats, registers, and ndv " +
      "tables routed through the same plans") {
    val path = tmp("colstats-sql")
    ColStats.buildIfAbsent(rows(0, 50), Seq("id", "v"), Seq("s"), path)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_colstats " +
      s"USING colstats OPTIONS (path '$path')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_colstats")) ==
      rowsOf(ColStats.stats(spark, path)))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_colstats_r " +
      s"USING colstats OPTIONS (path '$path', table 'registers')")
    assert(spark.sql("SELECT count(*) FROM graft_colstats_r")
      .head().getLong(0) == 3 * 64)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_colstats_n " +
      s"USING colstats OPTIONS (path '$path', table 'ndv')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_colstats_n")) ==
      rowsOf(ColStats.ndv(spark, path)))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_colstats_h " +
      s"USING colstats OPTIONS (path '$path', table 'hist')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_colstats_h")) ==
      rowsOf(ColStats.hist(spark, path)))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_colstats_q " +
      s"USING colstats OPTIONS (path '$path', table 'quantiles', " +
      "qs '0.25,0.75')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_colstats_q")) ==
      rowsOf(ColStats.quantiles(spark, path, Seq(0.25, 0.75))))
  }
}
