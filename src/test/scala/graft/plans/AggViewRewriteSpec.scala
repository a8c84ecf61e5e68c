package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.AggView

/** The materialized-view rewrite's contract, mechanically:
  *
  *  - a rewrite-eligible aggregate's optimized plan scans the
  *    ARTIFACT, not the base table, and its result equals the
  *    un-rewritten query bit-for-bit;
  *  - rollup to a key subset and the global (ungrouped) aggregate
  *    rewrite too; a key-complete equality probe emits the
  *    kb-partition-pruned scan;
  *  - every staleness/shape hazard REFUSES (base listing changed,
  *    view manifest moved, non-key filter, non-measure sum, avg,
  *    DISTINCT) — the query falls back to the base scan and stays
  *    correct, never serving a stale or mismatched view.
  */
class AggViewRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = {
    val s = SparkTestSession.spark
    AggViewRewrite.install(s)
    s
  }

  private var baseDir: String = _
  private var viewDir: String = _

  private def baseDf: DataFrame = spark.read.parquet(baseDir)

  private def buildSpecView(): AggView.Build =
    AggView.buildIfAbsent(baseDf, Seq("k", "g"),
      Seq(AggView.Measure("sum_2x", "CAST(x * 2 AS BIGINT)"),
        AggView.Measure("sum_y", "y"),
        AggView.Measure("sum_x", "x"),
        // x's NULL COUNTER: what makes count(x)/avg(x) derivable
        AggView.Measure("nn_x",
          "CASE WHEN x IS NULL THEN 0 ELSE 1 END")),
      viewDir, kbParts = 4)

  override def beforeAll(): Unit = {
    val root = Files.createTempDirectory("graft-mvrw-spec").toString
    baseDir = s"$root/base"
    viewDir = s"$root/view"
    val s = spark
    import s.implicits._
    // 300 rows, 3×2 groups, x long (some nulls), y double — plus an
    // ALL-NULL-x group (k3, g0), the avg edge case
    ((0 until 300).map { i =>
      (s"k${i % 3}", s"g${i % 2}",
        if (i % 17 == 0) None else Some(i.toLong),
        i * 0.5)
    } ++ (0 until 6).map(i => ("k3", "g0", None, i * 2.0)))
      .toDF("k", "g", "x", "y")
      .repartition(3)
      .write.parquet(baseDir)
    buildSpecView()
  }

  override def afterAll(): Unit = AggViewRewrite.clear()

  private def register(): Unit = {
    AggViewRewrite.register(spark, baseDf, viewDir); ()
  }

  private def scannedRoots(df: DataFrame): Set[String] =
    GraftBridge.optimizedPlan(df).collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.toSet

  private def hitsView(df: DataFrame): Boolean = {
    val roots = scannedRoots(df)
    roots.exists(_.contains(viewDir)) && !roots.exists(_.contains(baseDir))
  }

  private def sql(q: String): DataFrame = {
    baseDf.createOrReplaceTempView("mvspec_base")
    spark.sql(q)
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("exact-key aggregate rewrites to the view and matches the " +
      "base-scan answer") {
    AggViewRewrite.clear()
    val q = """SELECT k, g, count(*) AS cnt,
              |  sum(CAST(x * 2 AS BIGINT)) AS s2x, sum(y) AS sy
              |FROM mvspec_base GROUP BY k, g""".stripMargin
    val truth = sorted(sql(q)) // registry empty: base plan
    register()
    val rewritten = sql(q)
    assert(hitsView(rewritten),
      GraftBridge.optimizedPlan(rewritten).toString)
    assert(sorted(rewritten) == truth)
  }

  test("rollup to a key subset re-aggregates the view") {
    AggViewRewrite.clear()
    val q = """SELECT g, count(*) AS cnt, sum(y) AS sy
              |FROM mvspec_base GROUP BY g""".stripMargin
    val truth = sorted(sql(q))
    register()
    val r = sql(q)
    assert(hitsView(r), GraftBridge.optimizedPlan(r).toString)
    assert(sorted(r) == truth)
  }

  test("global ungrouped aggregate rewrites; a key filter selecting " +
      "nothing serves count 0 through the coalesce") {
    AggViewRewrite.clear()
    val q = """SELECT count(*) AS cnt, sum(y) AS sy
              |FROM mvspec_base""".stripMargin
    val truth = sorted(sql(q))
    register()
    val r = sql(q)
    assert(hitsView(r))
    assert(sorted(r) == truth)

    // a rewritten global aggregate whose key filter matches NO view
    // group must return (0, null), not an empty result
    val none = sql("""SELECT count(*) AS cnt, sum(y) AS sy
                     |FROM mvspec_base WHERE k = 'zz'""".stripMargin)
    assert(hitsView(none), GraftBridge.optimizedPlan(none).toString)
    val row = none.collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("key-only filter rewrites; key-complete equality prunes to " +
      "one kb partition") {
    AggViewRewrite.clear()
    val subset = """SELECT k, count(*) AS cnt FROM mvspec_base
                   |WHERE g = 'g1' GROUP BY k""".stripMargin
    val probe = """SELECT k, g, sum(y) AS sy FROM mvspec_base
                  |WHERE k = 'k2' AND g = 'g0' GROUP BY k, g""".stripMargin
    val truthSubset = sorted(sql(subset))
    val truthProbe = sorted(sql(probe))
    register()
    val rs = sql(subset)
    assert(hitsView(rs))
    assert(sorted(rs) == truthSubset)
    val rp = sql(probe)
    assert(hitsView(rp))
    assert(sorted(rp) == truthProbe)
    val phys = rp.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters"), phys)
    assert(phys.contains("kb#"), phys)

    // IN-lists prune too: the bucket set is the (bounded) cartesian
    // of the per-key value sets
    val inq = """SELECT k, g, sum(y) AS sy FROM mvspec_base
                |WHERE k IN ('k0', 'k2') AND g = 'g1'
                |GROUP BY k, g""".stripMargin
    AggViewRewrite.clear()
    val truthIn = sorted(sql(inq))
    register()
    val rin = sql(inq)
    assert(hitsView(rin))
    assert(sorted(rin) == truthIn)
    val physIn = rin.queryExecution.executedPlan.toString
    assert(physIn.contains("PartitionFilters"), physIn)
    assert(physIn.contains("kb#"), physIn)
  }

  test("count(col) and avg(col) rewrite through the declared null " +
      "counter, including the all-null group") {
    AggViewRewrite.clear()
    val q = """SELECT k, g, count(x) AS cx, avg(x) AS ax,
              |  count(*) AS cnt
              |FROM mvspec_base GROUP BY k, g""".stripMargin
    val truth = sorted(sql(q)) // includes (k3, g0): cx = 0, ax = null
    register()
    val r = sql(q)
    assert(hitsView(r), GraftBridge.optimizedPlan(r).toString)
    assert(sorted(r) == truth)
    // the all-null group really is exercised: count 0, avg null
    val k3 = r.filter(col("k") === "k3").collect().head
    assert(k3.getLong(2) == 0L && k3.isNullAt(3))
  }

  test("scalar expressions of keys in the select list rewrite") {
    AggViewRewrite.clear()
    val q = """SELECT concat(k, '/', g) AS kg, sum(y) AS sy
              |FROM mvspec_base GROUP BY k, g""".stripMargin
    val truth = sorted(sql(q))
    register()
    val r = sql(q)
    assert(hitsView(r))
    assert(sorted(r) == truth)
  }

  test("derived-key grouping and DISTINCT-over-key aggregates serve " +
      "from the view: GROUP BY f(keys) re-folds the rollup under the " +
      "coarser groups; DISTINCT over key columns forwards verbatim; " +
      "expressions mixing in a non-key column refuse") {
    AggViewRewrite.clear()
    val served = Seq(
      // grouping by an expression of one key (collapses k0/k1/k2/k3
      // by digit parity) with count/sum/avg re-folding under it
      """SELECT CAST(substr(k, 2, 1) AS INT) % 2 AS kp,
        |  count(*) AS c, sum(CAST(x * 2 AS BIGINT)) AS s2x,
        |  avg(x) AS ax
        |FROM mvspec_base GROUP BY CAST(substr(k, 2, 1) AS INT) % 2
        |""".stripMargin,
      // grouping by an expression of BOTH keys
      """SELECT concat(substr(k, 2, 1), g) AS kg, sum(y) AS sy
        |FROM mvspec_base
        |GROUP BY concat(substr(k, 2, 1), g)""".stripMargin,
      // flat DISTINCT over a key, mixed with a regular measure
      """SELECT count(DISTINCT k) AS dk, sum(y) AS sy
        |FROM mvspec_base""".stripMargin,
      // DISTINCT over one key grouped by the other
      """SELECT g, count(DISTINCT k) AS dk
        |FROM mvspec_base GROUP BY g""".stripMargin,
      // derived grouping + DISTINCT over a key expression together
      """SELECT substr(g, 2, 1) AS gp, count(DISTINCT substr(k, 2, 1))
        |  AS dk, count(*) AS c
        |FROM mvspec_base GROUP BY substr(g, 2, 1)""".stripMargin,
      // FILTER clauses over keys commute with the rollup: sum /
      // count(*) / avg-through-counter, incl. a group where the
      // filter matches nothing (NULL sum, 0 count). A distinct
      // aggregate WITH a filter goes through Spark's Expand rewrite
      // and falls back by shape — not asserted here
      """SELECT k, sum(CAST(x * 2 AS BIGINT))
        |    FILTER (WHERE g = 'g1') AS s2x,
        |  count(*) FILTER (WHERE g = 'g0') AS c0,
        |  avg(x) FILTER (WHERE g = 'g1') AS ax
        |FROM mvspec_base GROUP BY k""".stripMargin)
    val truths = served.map(q => sorted(sql(q)))
    register()
    served.zip(truths).foreach { case (q, truth) =>
      val r = sql(q)
      assert(hitsView(r), s"$q\n${GraftBridge.optimizedPlan(r)}")
      assert(sorted(r) == truth, q)
    }
    // a grouping expression touching a NON-key column refuses
    val g1 = sql("""SELECT concat(k, CAST(y AS STRING)) AS ky,
                   |  count(*) AS c
                   |FROM mvspec_base
                   |GROUP BY concat(k, CAST(y AS STRING))""".stripMargin)
    assert(!scannedRoots(g1).exists(_.contains(viewDir)))
    // a DISTINCT aggregate whose input mixes key and non-key refuses
    val g2 = sql("""SELECT count(DISTINCT concat(k, CAST(x AS STRING)))
                   |  AS c FROM mvspec_base""".stripMargin)
    assert(!scannedRoots(g2).exists(_.contains(viewDir)))
    // a FILTER clause touching a non-key column refuses
    val g3 = sql("""SELECT k, count(*) FILTER (WHERE y > 10) AS c
                   |FROM mvspec_base GROUP BY k""".stripMargin)
    assert(!scannedRoots(g3).exists(_.contains(viewDir)))
  }

  test("ROLLUP / CUBE / GROUPING SETS serve from the view through " +
      "the Expand shape: grouping-set key slots re-address, gid " +
      "forwards, aggregates re-fold through carrier slots; derived " +
      "rollup keys and key filters work; a rolled-up key inside an " +
      "aggregate refuses") {
    AggViewRewrite.clear()
    val served = Seq(
      // plain rollup over both keys with count/sum/avg
      """SELECT k, g, count(*) AS c, sum(CAST(x * 2 AS BIGINT)) AS s2x,
        |  avg(x) AS ax
        |FROM mvspec_base GROUP BY ROLLUP(k, g)""".stripMargin,
      // cube with grouping() and grouping_id() expressions over gid
      """SELECT k, g, grouping(k) AS gk, grouping_id(k, g) AS gid,
        |  count(*) AS c
        |FROM mvspec_base GROUP BY CUBE(k, g)""".stripMargin,
      // explicit grouping sets incl. the grand total
      """SELECT k, g, sum(y) AS sy
        |FROM mvspec_base
        |GROUP BY GROUPING SETS ((k), (g), ())""".stripMargin,
      // a derived rollup key (computed Project below the Expand)
      """SELECT substr(k, 2, 1) AS kd, count(*) AS c
        |FROM mvspec_base GROUP BY ROLLUP(substr(k, 2, 1))""".stripMargin,
      // a key-only WHERE below the Expand
      """SELECT k, g, count(*) AS c
        |FROM mvspec_base WHERE k <> 'k3'
        |GROUP BY ROLLUP(k, g)""".stripMargin)
    val truths = served.map(q => sorted(sql(q)))
    register()
    served.zip(truths).foreach { case (q, truth) =>
      val r = sql(q)
      assert(hitsView(r), s"$q\n${GraftBridge.optimizedPlan(r)}")
      assert(sorted(r) == truth, q)
    }
    // a key-complete equality filter under the rollup kb-prunes the
    // served read (the shared kbPartsFor path)
    val pruned = sql("""SELECT k, g, count(*) AS c
                       |FROM mvspec_base WHERE k = 'k1' AND g = 'g0'
                       |GROUP BY ROLLUP(k, g)""".stripMargin)
    assert(hitsView(pruned))
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [kb"),
      pruned.queryExecution.executedPlan.toString)
    // base data: k = k(i%3), g = g(i%2) over 300 rows → (k1, g0) has
    // the i ≡ 4 (mod 6) rows: 50 — in all three rollup sets
    assert(sorted(pruned) ==
      Seq("[k1,g0,50]", "[k1,null,50]", "[null,null,50]").sorted,
      sorted(pruned))
    // a rolled-up key inside an aggregate folds per grouping set,
    // never servable from the rollup
    val r1 = sql("""SELECT g, count(k) AS ck
                   |FROM mvspec_base GROUP BY ROLLUP(g, k)""".stripMargin)
    assert(!scannedRoots(r1).exists(_.contains(viewDir)))
    // a non-key WHERE below the Expand refuses
    val r2 = sql("""SELECT k, count(*) AS c
                   |FROM mvspec_base WHERE y > 10
                   |GROUP BY ROLLUP(k)""".stripMargin)
    assert(!scannedRoots(r2).exists(_.contains(viewDir)))
    // a non-measure sum through the Expand refuses
    val r3 = sql("""SELECT k, sum(CAST(x * 3 AS BIGINT)) AS s
                   |FROM mvspec_base GROUP BY ROLLUP(k)""".stripMargin)
    assert(!scannedRoots(r3).exists(_.contains(viewDir)))
  }

  test("shape hazards refuse: non-key filter, non-measure sum, avg, " +
      "distinct, count(nullable col)") {
    AggViewRewrite.clear()
    register()
    val refused = Seq(
      // filter on a non-key column
      """SELECT k, count(*) AS c FROM mvspec_base
        |WHERE y > 10 GROUP BY k""".stripMargin,
      // sum of an expression that is not a declared measure
      """SELECT k, sum(CAST(x * 3 AS BIGINT)) AS s
        |FROM mvspec_base GROUP BY k""".stripMargin,
      // avg of a column with NO declared null counter
      """SELECT k, avg(y) AS a FROM mvspec_base GROUP BY k""".stripMargin,
      // distinct aggregate over a NON-key column (the rollup has no
      // per-group distinct-x set; DISTINCT over keys serves — see
      // the derived-key/distinct test)
      """SELECT k, count(DISTINCT x) AS c
        |FROM mvspec_base GROUP BY k""".stripMargin,
      // count of a nullable column with NO declared null counter
      """SELECT k, count(y) AS c FROM mvspec_base GROUP BY k""".stripMargin,
      // grouping by a non-key column
      """SELECT y, count(*) AS c FROM mvspec_base GROUP BY y""".stripMargin)
    for (q <- refused) {
      val df = sql(q)
      assert(!scannedRoots(df).exists(_.contains(viewDir)), q)
      assert(scannedRoots(df).exists(_.contains(baseDir)), q)
    }
  }

  test("base-listing staleness refuses: a file landing in the base " +
      "dir disables the rewrite until re-registration") {
    AggViewRewrite.clear()
    register()
    val q = "SELECT k, count(*) AS c FROM mvspec_base GROUP BY k"
    assert(hitsView(sql(q)))
    // a late file lands in the fact table's directory
    val s = spark
    import s.implicits._
    Seq(("k9", "g9", Some(1L), 1.0)).toDF("k", "g", "x", "y")
      .write.mode("append").parquet(baseDir)
    val total = baseDf.count() // includes the new row
    val after = sql(q) // fresh read = fresh listing
    assert(!scannedRoots(after).exists(_.contains(viewDir)))
    // and the un-rewritten answer SEES the new row
    assert(after.collect().map(_.getLong(1)).sum == total)
    // re-sync: rebuild the view over the current listing, re-register
    AggView.purge(spark, viewDir)
    val b = buildSpecView()
    assert(!b.reused) // the corpus changed, so the build ran
    register()
    val resync = sql(q)
    assert(hitsView(resync))
    assert(resync.collect().map(_.getLong(1)).sum == total)
  }

  test("view-manifest staleness refuses: a maintenance commit after " +
      "registration disables the rewrite (poisoned view is never " +
      "served)") {
    AggViewRewrite.clear()
    register()
    val q = "SELECT k, g, sum(y) AS sy FROM mvspec_base GROUP BY k, g"
    val truth = sorted(sql(q))
    assert(hitsView(sql(q)))
    // poison: rows appended to the VIEW only (base unchanged) — a
    // rewrite now would over-count; the version pin must refuse
    val s = spark
    import s.implicits._
    AggView.append(
      Seq(("k0", "g0", Some(5L), 100.0)).toDF("k", "g", "x", "y"),
      viewDir)
    val after = sql(q)
    assert(!scannedRoots(after).exists(_.contains(viewDir)))
    assert(sorted(after) == truth) // still the base-true answer
  }

  test("rewritten() is scoped: the registry is empty afterwards and " +
      "the returned plan stays rewritten") {
    AggViewRewrite.clear()
    // fresh artifact state for this test (prior tests mutated it)
    AggView.purge(spark, viewDir)
    buildSpecView()
    val q = "SELECT k, count(*) AS c FROM mvspec_base GROUP BY k"
    val truth = sorted(sql(q))
    val out = AggViewRewrite.rewritten(spark, baseDf, viewDir)(sql(q))
    assert(hitsView(out), GraftBridge.optimizedPlan(out).toString)
    assert(sorted(out) == truth)
    // scoped: a NEW query no longer rewrites
    assert(!scannedRoots(sql(q)).exists(_.contains(viewDir)))
  }

  test("HAVING filters the rewritten aggregate's output untouched") {
    AggViewRewrite.clear()
    val q = """SELECT k, count(*) AS c FROM mvspec_base
              |GROUP BY k HAVING count(*) > 90""".stripMargin
    val truth = sorted(sql(q))
    register()
    val r = sql(q)
    assert(hitsView(r), GraftBridge.optimizedPlan(r).toString)
    assert(sorted(r) == truth && truth.nonEmpty)
  }

  test("status() reports the pin and its live freshness") {
    AggViewRewrite.clear()
    register()
    val row = AggViewRewrite.status(spark).collect().head
    assert(row.getAs[String]("view_path") == viewDir)
    assert(row.getAs[Boolean]("version_fresh"))
    // a maintenance commit flips freshness off
    val s = spark
    import s.implicits._
    AggView.append(
      Seq(("k0", "g0", Some(1L), 1.0)).toDF("k", "g", "x", "y"),
      viewDir)
    val after = AggViewRewrite.status(spark).collect().head
    assert(!after.getAs[Boolean]("version_fresh"))
    assert(after.getAs[Long]("live_version") >
      after.getAs[Long]("pinned_version"))
  }

  test("a bounded BETWEEN range over an integral key enumerates and " +
      "prunes kb partitions like an equality probe") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-range").toString
    val s = spark
    import s.implicits._
    (0 until 200).map(i => (i % 10, i.toDouble))
      .toDF("ik", "y").repartition(2).write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("ik"),
      Seq(AggView.Measure("sum_y", "y")), s"$root/view", kbParts = 8)
    b.createOrReplaceTempView("mvspec_range_base")
    val q = """SELECT ik, count(*) AS c, sum(y) AS sy
              |FROM mvspec_range_base
              |WHERE ik BETWEEN 3 AND 5 GROUP BY ik""".stripMargin
    val truth = sorted(s.sql(q))
    AggViewRewrite.register(s, b, s"$root/view")
    val r = s.sql(q)
    val roots = scannedRoots(r)
    assert(roots.exists(_.contains(s"$root/view")), r.queryExecution)
    assert(sorted(r) == truth && truth.size == 3)
    val phys = r.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters"), phys)
    assert(phys.contains("kb#"), phys)
    // an UNBOUNDED range still rewrites (filters are key-only), just
    // without the kb prune
    val open = s.sql("""SELECT ik, sum(y) AS sy FROM mvspec_range_base
                       |WHERE ik >= 7 GROUP BY ik""".stripMargin)
    assert(scannedRoots(open).exists(_.contains(s"$root/view")))
    AggViewRewrite.clear()
    assert(sorted(open) == sorted(s.sql(
      """SELECT ik, sum(y) AS sy FROM mvspec_range_base
        |WHERE ik >= 7 GROUP BY ik""".stripMargin)))
  }

  test("a DATE key enumerates a bounded BETWEEN day-by-day into the " +
      "kb prune, and an unbounded date range prunes through zones") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-date").toString
    val s = spark
    import s.implicits._
    // 40 distinct days over 8 kb buckets
    (0 until 400).map(i =>
        (java.time.LocalDate.of(2024, 1, 1).plusDays(i % 40), i.toDouble))
      .toDF("dk", "y").repartition(2).write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("dk"),
      Seq(AggView.Measure("sum_y", "y")), s"$root/view", kbParts = 8)
    b.createOrReplaceTempView("mvspec_date_base")
    val q = """SELECT dk, count(*) AS c, sum(y) AS sy
              |FROM mvspec_date_base
              |WHERE dk BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
              |GROUP BY dk""".stripMargin
    val truth = sorted(s.sql(q))
    // unbounded date tail: not enumerable — the per-kb date ZONES
    // (days-since-epoch) prune instead
    val openQ = """SELECT dk, sum(y) AS sy FROM mvspec_date_base
                  |WHERE dk >= DATE '2024-02-08' GROUP BY dk""".stripMargin
    val openTruth = sorted(s.sql(openQ))
    AggViewRewrite.register(s, b, s"$root/view", keyZones = true)
    val r = s.sql(q)
    assert(scannedRoots(r).exists(_.contains(s"$root/view")),
      r.queryExecution)
    assert(sorted(r) == truth && truth.size == 3)
    val phys = r.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters: [kb"), phys)
    val open = s.sql(openQ)
    assert(scannedRoots(open).exists(_.contains(s"$root/view")))
    assert(open.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [kb"),
      open.queryExecution.executedPlan.toString)
    val got = sorted(open)
    AggViewRewrite.clear()
    assert(got == openTruth && got.size == 2)
  }

  test("key-zone pruning (opt-in): LIKE-prefix and unbounded-range " +
      "key probes prune kb partitions the hash cannot enumerate; " +
      "without zones they rewrite unpruned; results exact") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-zones").toString
    val s = spark
    import s.implicits._
    // 26 distinct string keys aa..az spread over 8 kb buckets
    (0 until 2600).map(i => (s"a${('a' + i % 26).toChar}", i.toDouble))
      .toDF("sk", "y").repartition(2).write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("sk"),
      Seq(AggView.Measure("sum_y", "y")), s"$root/view", kbParts = 8)
    b.createOrReplaceTempView("mvspec_zone_base")
    val prefix = """SELECT sk, count(*) AS c, sum(y) AS sy
                   |FROM mvspec_zone_base
                   |WHERE sk LIKE 'ab%' GROUP BY sk""".stripMargin
    val range = """SELECT sk, sum(y) AS sy FROM mvspec_zone_base
                  |WHERE sk >= 'ay' GROUP BY sk""".stripMargin
    val truthPrefix = sorted(sql(prefix))
    val truthRange = sorted(sql(range))
    // the kb partition filter in the scan metadata is the pruning
    // observable (the q231 precedent: AQE hides selectedPartitions
    // but the scan's PartitionFilters clause prints)
    def kbPruned(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [kb")
    // without zones: rewrites, but no kb partition filter
    AggViewRewrite.register(s, b, s"$root/view")
    val un = sql(prefix)
    assert(scannedRoots(un).exists(_.contains(s"$root/view")))
    assert(sorted(un) == truthPrefix)
    assert(!kbPruned(un), un.queryExecution.executedPlan.toString)
    // with zones: the prefix probe prunes to the kb(s) whose key
    // zone intersects [ab, ac)
    AggViewRewrite.clear()
    AggViewRewrite.register(s, b, s"$root/view", keyZones = true)
    val zp = sql(prefix)
    assert(scannedRoots(zp).exists(_.contains(s"$root/view")))
    assert(sorted(zp) == truthPrefix && truthPrefix.size == 1)
    assert(kbPruned(zp), zp.queryExecution.executedPlan.toString)
    // unbounded range prunes too (ay/az live in at most 2 buckets)
    val zr = sql(range)
    assert(scannedRoots(zr).exists(_.contains(s"$root/view")))
    assert(sorted(zr) == truthRange && truthRange.size == 2)
    assert(kbPruned(zr), zr.queryExecution.executedPlan.toString)
    // a batch landing on both sides: refreshPins recomputes the
    // zones with the new pin, and a probe for the NEW key prefix
    // still answers exactly (never pruned away)
    val delta = Seq(("zz", 5.0), ("zz", 7.0)).toDF("sk", "y")
    delta.write.mode("append").parquet(s"$root/base")
    AggView.append(delta, s"$root/view")
    val ref = AggViewRewrite.refreshPins(s).collect().head
    assert(ref.getBoolean(1), ref.getString(2))
    // fresh read: the old DataFrame's in-memory listing predates the
    // append (the sig-mismatch refusal is its own, already-covered
    // case — here we want the refreshed pin to serve)
    s.read.parquet(s"$root/base")
      .createOrReplaceTempView("mvspec_zone_base")
    val nz = sql("""SELECT sk, sum(y) AS sy FROM mvspec_zone_base
                   |WHERE sk LIKE 'zz%' GROUP BY sk""".stripMargin)
    assert(scannedRoots(nz).exists(_.contains(s"$root/view")))
    assert(nz.collect().map(_.getDouble(1)).toSeq == Seq(12.0))
    AggViewRewrite.clear()
  }

  test("key zones honor the UTF-8 byte-order and null contracts: a " +
      "supplementary-plane key is never pruned for its own probe; " +
      "null-keyed groups survive IS NULL and drop for LIKE") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-zutf").toString
    val s = spark
    import s.implicits._
    // one kb-worth of keys incl. an emoji (U+1F600, outside the BMP:
    // UTF-16 code-unit order would sort it BELOW U+E000..U+FFFF
    // singles — byte order must rule, exactly as for file zones) and
    // a null key
    val emojiKey = "\uD83D\uDE00" // U+1F600
    val rows = Seq(Some("a"), Some(emojiKey), Some("\uFFFD"),
      None).zipWithIndex.map { case (k, i) => (k, (i + 1).toDouble) }
    rows.toDF("sk", "y").write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("sk"),
      Seq(AggView.Measure("sum_y", "y")), s"$root/view", kbParts = 4)
    AggViewRewrite.register(s, b, s"$root/view", keyZones = true)
    b.createOrReplaceTempView("mvspec_zutf_base")
    // probe for the emoji key: a UTF-16 comparison would place it
    // outside [min, max] of a zone whose max is U+FFFD and prune the
    // group away — byte order keeps it
    val emoji = sql(s"""SELECT sk, sum(y) AS sy FROM mvspec_zutf_base
                       |WHERE sk >= '$emojiKey'
                       |GROUP BY sk""".stripMargin)
    assert(scannedRoots(emoji).exists(_.contains(s"$root/view")))
    assert(emoji.collect().map(_.getDouble(1)).toSeq == Seq(2.0))
    // null-keyed group: IS NULL keeps it, a LIKE probe (null-
    // rejecting) answers without it
    val nul = sql("""SELECT count(*) AS c FROM (
                    |  SELECT sk, sum(y) AS sy FROM mvspec_zutf_base
                    |  WHERE sk IS NULL GROUP BY sk)""".stripMargin)
    assert(nul.collect().head.getLong(0) == 1L)
    val like = sql("""SELECT sk, sum(y) AS sy FROM mvspec_zutf_base
                     |WHERE sk LIKE 'a%' GROUP BY sk""".stripMargin)
    assert(scannedRoots(like).exists(_.contains(s"$root/view")))
    assert(like.collect().map(_.getDouble(1)).toSeq == Seq(1.0))
    AggViewRewrite.clear()
  }

  test("min/max measures rewrite kind-gated: min(E)/max(E) serve " +
      "from their declared extrema, sum(E) never lands on an " +
      "extremum, and min over a sum-only view falls back") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-minmax").toString
    val s = spark
    import s.implicits._
    (0 until 300).map(i => (s"g${i % 4}", (i * 13 % 97).toLong))
      .toDF("gk", "v").repartition(2).write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("gk"),
      Seq(AggView.Measure("v_sum", "v"),
        AggView.Measure("v_min", "v", kind = "min"),
        AggView.Measure("v_max", "v", kind = "max")),
      s"$root/view", kbParts = 4)
    b.createOrReplaceTempView("mvspec_mm_base")
    val q = """SELECT gk, count(*) AS c, sum(v) AS sv, min(v) AS mn,
              |  max(v) AS mx
              |FROM mvspec_mm_base GROUP BY gk""".stripMargin
    val truth = sorted(s.sql(q))
    AggViewRewrite.register(s, b, s"$root/view")
    val r = s.sql(q)
    assert(scannedRoots(r).exists(_.contains(s"$root/view")),
      r.queryExecution.optimizedPlan)
    assert(sorted(r) == truth && truth.size == 4)
    // a rollup to the GLOBAL level keeps extrema exact (min of mins)
    val g = s.sql("""SELECT min(v) AS mn, max(v) AS mx, sum(v) AS sv
                    |FROM mvspec_mm_base""".stripMargin)
    assert(scannedRoots(g).exists(_.contains(s"$root/view")))
    val gotG = sorted(g)
    // min over a view that declares only a SUM for that expression
    // must fall back (kind gate) — use the spec view: x has sum_x
    // but no min measure
    AggViewRewrite.register(spark, baseDf, viewDir)
    val mm = sql("""SELECT k, min(x) AS mn FROM mvspec_base
                   |GROUP BY k""".stripMargin)
    assert(!hitsView(mm), mm.queryExecution.optimizedPlan)
    AggViewRewrite.clear()
    assert(gotG == sorted(s.sql(
      """SELECT min(v) AS mn, max(v) AS mx, sum(v) AS sv
        |FROM mvspec_mm_base""".stripMargin)))
  }

  test("register refuses a view whose key collides with the served " +
      "count column under the session resolver (any case)") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-cnt").toString
    val s = spark
    import s.implicits._
    Seq(("a", 1L), ("b", 2L)).toDF("CNT", "x")
      .write.parquet(s"$root/base")
    val b = s.read.parquet(s"$root/base")
    AggView.buildIfAbsent(b, Seq("CNT"),
      Seq(AggView.Measure("sum_x", "x")), s"$root/view", kbParts = 2)
    val ex = intercept[IllegalArgumentException] {
      AggViewRewrite.register(s, b, s"$root/view")
    }
    assert(ex.getMessage.contains("cnt"))
  }

  test("refreshPins re-pins a parquet base only when base and view " +
      "verifiably hold the same content") {
    AggViewRewrite.clear()
    val root = Files.createTempDirectory("graft-mvrw-refresh").toString
    val s = spark
    import s.implicits._
    def rows(from: Int, until: Int) =
      (from until until).map(i => (s"k${i % 3}", i.toLong))
        .toDF("k", "x")
    rows(0, 90).repartition(2).write.parquet(s"$root/base")
    def b = s.read.parquet(s"$root/base")
    val view = s"$root/view"
    AggView.buildIfAbsent(b, Seq("k"),
      Seq(AggView.Measure("sum_x", "x")), view, kbParts = 4)
    AggViewRewrite.register(s, b, view)
    def q = {
      b.createOrReplaceTempView("mvspec_refresh_base")
      s.sql("""SELECT k, count(*) AS c, sum(x) AS sx
              |FROM mvspec_refresh_base GROUP BY k""".stripMargin)
    }
    assert(scannedRoots(q).exists(_.contains(view)))

    // the CDC fleet applies one batch to BOTH sides
    rows(90, 120).write.mode("append").parquet(s"$root/base")
    AggView.append(rows(90, 120), view)
    // both pins moved: the rewrite refuses until a refresh
    assert(!scannedRoots(q).exists(_.contains(view)))
    val st1 = AggViewRewrite.refreshPins(s).collect().head
    assert(st1.getBoolean(1), st1.getString(2)) // refreshed
    val r1 = q
    assert(scannedRoots(r1).exists(_.contains(view)))
    assert(r1.collect().map(_.getLong(1)).sum == 120L)

    // a BASE-ONLY append: refresh must REFUSE (fingerprints diverge)
    rows(120, 130).write.mode("append").parquet(s"$root/base")
    val st2 = AggViewRewrite.refreshPins(s).collect().head
    assert(!st2.getBoolean(1) && st2.getString(2).contains("diverge"))
    val r2 = q // falls back to the (correct) base scan
    assert(!scannedRoots(r2).exists(_.contains(view)))
    assert(r2.collect().map(_.getLong(1)).sum == 130L)

    // the view catches up: refresh verifies and re-pins
    AggView.append(rows(120, 130), view)
    val st3 = AggViewRewrite.refreshPins(s).collect().head
    assert(st3.getBoolean(1), st3.getString(2))
    val r3 = q
    assert(scannedRoots(r3).exists(_.contains(view)))
    assert(r3.collect().map(_.getLong(1)).sum == 130L)

    // idempotent: a second refresh reports already fresh
    val st4 = AggViewRewrite.refreshPins(s).collect().head
    assert(!st4.getBoolean(1) && st4.getString(2).contains("fresh"))
  }

  test("with several sufficient views registered, the coarsest wins") {
    AggViewRewrite.clear()
    val q = "SELECT g, sum(y) AS sy FROM mvspec_base GROUP BY g"
    val truth = sorted(sql(q))
    // a coarser sibling view keyed by g only
    val vg = Files.createTempDirectory("graft-mvrw-coarse").toString
    AggView.buildIfAbsent(baseDf, Seq("g"),
      Seq(AggView.Measure("sum_y", "y")), vg, kbParts = 2)
    register() // the fine (k, g) view
    AggViewRewrite.register(spark, baseDf, vg)
    val r = sql(q)
    val roots = scannedRoots(r)
    assert(roots.exists(_.contains(vg)), r.queryExecution.optimizedPlan)
    assert(!roots.exists(_.contains(viewDir)) &&
      !roots.exists(_.contains(baseDir)))
    assert(sorted(r) == truth)
  }
}
