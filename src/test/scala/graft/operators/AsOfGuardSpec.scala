package graft.operators

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The asOfMerge hot-key guard (AsOf.scala): keys whose timeline
  * exceeds maxKeyRows are time-sliced so no single task sorts a
  * monster key's whole history. The guard must be invisible in the
  * RESULT (sliced ≡ unguarded on every joinType/clamp combination,
  * including the degenerate single-instant key) and visible in the
  * PLAN (a Window partitioned by (key, __asof_slice), i.e. bounded
  * per-task input).
  */
class AsOfGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Canonical sorted image of an asOfMerge result for equality. */
  private def img(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq.sorted
  }

  test("guarded plan stays SortAggregate-free — struct-payload " +
      "summaries must ride window frames, not struct-buffer aggregates") {
    // fixture with distinct (k, date) by construction: a groupBy-first
    // dedup here would itself plan a (fixture-side) SortAggregate
    val snaps = (0 until 100).map(i => ((i % 6).toLong,
      Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)), s"v$i"))
      .toDF("k", "snap_date", "v")
    val facts = (1 to 300).map(i => (i.toLong, (i % 8).toLong,
      Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i % 320))))
      .toDF("id", "k", "t")
    val p = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
        Seq("k"), "inner", clamp = true, maxKeyRows = 20)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortAggregate"), p.take(3000))
  }

  private def randomData(seed: Int, nKeys: Int, nSnaps: Int, nFacts: Int) = {
    val rnd = new scala.util.Random(seed)
    val snaps = (1 to nSnaps).map { i =>
      (rnd.nextInt(nKeys).toLong, Date.valueOf(java.time.LocalDate
        .of(2020, 1, 1).plusDays(rnd.nextInt(300))), s"v$i")
    }.toDF("k", "snap_date", "v")
      // dedup (k, date) so the matched payload is deterministic
      .groupBy("k", "snap_date").agg(first("v").as("v"))
    val facts = (1 to nFacts).map { i =>
      (i.toLong, rnd.nextInt(nKeys + 2).toLong,
        Date.valueOf(java.time.LocalDate
          .of(2020, 1, 1).plusDays(rnd.nextInt(320))))
    }.toDF("id", "k", "t")
    (facts, snaps)
  }

  test("differential: guarded (every key hot) ≡ unguarded on random " +
      "data, for inner/left × strict/clamp") {
    val (facts, snaps) = randomData(7, 12, 300, 800)
    for (joinType <- Seq("inner", "left"); clamp <- Seq(false, true)) {
      val plain = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
        Seq("k"), joinType, clamp, maxKeyRows = 0)
      // threshold 20 → every key's timeline is hot → full sliced path
      val sliced = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
        Seq("k"), joinType, clamp, maxKeyRows = 20)
      assert(img(sliced) == img(plain), s"$joinType clamp=$clamp")
    }
  }

  test("mixed hot/cold routing: only oversized keys take the sliced " +
      "branch, and the union matches the unguarded result") {
    val (facts0, snaps) = randomData(11, 8, 200, 400)
    // key 0 gets a monster timeline; the rest stay under threshold
    val monster = (1 to 3000).map { i =>
      ((100000 + i).toLong, 0L, Date.valueOf(java.time.LocalDate
        .of(2020, 1, 1).plusDays(i % 320)))
    }.toDF("id", "k", "t")
    val facts = facts0.unionByName(monster)
    val plain = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
      Seq("k"), "left", clamp = true, maxKeyRows = 0)
    val guarded = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
      Seq("k"), "left", clamp = true, maxKeyRows = 1000)
    assert(img(guarded) == img(plain))
  }

  test("degenerate single-instant hot key: every fact takes the key's " +
      "(unique-payload) snapshot; facts-only instant keys still miss") {
    val d = Date.valueOf("2020-06-01")
    val snaps = Seq((1L, d, "only")).toDF("k", "snap_date", "v")
    val facts = ((1 to 500).map(i => (i.toLong, 1L, d)) ++
      (1 to 500).map(i => ((1000 + i).toLong, 2L, d)))
      .toDF("id", "k", "t")
    val got = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
      Seq("k"), "left", maxKeyRows = 50)
    assert(got.count() == 1000)
    assert(got.filter(col("k") === 1 && col("v") === "only").count() == 500)
    assert(got.filter(col("k") === 2 && col("v").isNull).count() == 500)
  }

  test("monster key (~10^6 rows): result hash-equal to unguarded, and " +
      "the plan's window partitioning carries the slice column") {
    val snaps = spark.range(1000)
      .select(lit(0L).as("k"),
        date_add(lit(Date.valueOf("2000-01-01")),
          (col("id") * 7).cast("int")).as("snap_date"),
        concat(lit("s"), col("id")).as("v"))
    val facts = spark.range(1000000)
      .select(col("id"), lit(0L).as("k"),
        date_add(lit(Date.valueOf("2000-01-01")),
          pmod(col("id") * 37, lit(7200)).cast("int")).as("t"))
    def hashOf(df: DataFrame): java.math.BigDecimal = df
      .select(xxhash64(df.columns.sorted.map(col): _*)
        .cast("decimal(38,0)").as("h"))
      .agg(sum("h")).collect().head.getDecimal(0)
    val guarded = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
      Seq("k"), "inner", maxKeyRows = 100000)
    val plain = AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
      Seq("k"), "inner", maxKeyRows = 0)
    // bounded per-task input: the big window partitions on
    // (k, __asof_slice), never on k alone for the hot branch
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("__asof_slice"), plan.take(2000))
    assert(
      "windowspecdefinition\\(k#\\d+L, __asof_slice#\\d+".r
        .findFirstIn(plan).isDefined, plan.take(2000))
    assert(hashOf(guarded) == hashOf(plain))
    assert(guarded.count() == plain.count())
  }

  test("timestamp_ntz axis: guard slices without a session-TZ cast " +
      "and matches the unguarded result") {
    val snaps = spark.range(50)
      .select(lit(1L).as("k"),
        (lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00"))
          .cast("timestamp_ntz") +
          make_interval(lit(0), lit(0), lit(0), lit(0), col("id") * 11))
          .as("snap_ts"),
        concat(lit("p"), col("id")).as("v"))
    val facts = spark.range(5000)
      .select(col("id"), lit(1L).as("k"),
        (lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00"))
          .cast("timestamp_ntz") + make_interval(lit(0), lit(0), lit(0),
          lit(0), lit(0), col("id") * 13))
          .as("t"))
    val guarded = AsOf.asOfMerge(facts, snaps, col("t"), "snap_ts",
      Seq("k"), "inner", clamp = true, maxKeyRows = 500)
    val plain = AsOf.asOfMerge(facts, snaps, col("t"), "snap_ts",
      Seq("k"), "inner", clamp = true, maxKeyRows = 0)
    assert(img(guarded) == img(plain))
  }
}
