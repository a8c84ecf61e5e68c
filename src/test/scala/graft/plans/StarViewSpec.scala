package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.AggView

/** JOIN-AWARE materialized views ([[AggViewRewrite.registerStar]]) —
  * the star contract, mechanically:
  *
  *  - a grouped SUM/COUNT aggregate over `fact ⋈ dim1 ⋈ dim2` (inner
  *    equi-joins on the declared key pairs) plans onto the VIEW's
  *    files — neither the fact nor any dim is scanned — and equals
  *    the direct answer bit-for-bit; key-subset rollups and
  *    key-equality probes (kb-pruned) rewrite too;
  *  - a FLAT aggregate over the fact alone never serves from the
  *    joined rollup (inner-join multiplicity differs — the
  *    correctness gate);
  *  - join shape hazards refuse: wrong join keys, an extra
  *    unregistered join, a filter on a non-key column;
  *  - a DIM change refuses the pin (rewrite falls back; refreshPins
  *    names the dim and demands re-registration) — dims are
  *    immutable under a star registration;
  *  - fact-side IVM: append the JOINED delta to the view, land the
  *    fact files, and refreshPins re-verifies by fingerprinting the
  *    joined rows of ONLY the new fact files, then serves the grown
  *    answer.
  */
class StarViewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = {
    val s = SparkTestSession.spark
    AggViewRewrite.install(s)
    s
  }

  private var root: String = _
  private def factDf: DataFrame = spark.read.parquet(s"$root/fact")
  private def d1Df: DataFrame = spark.read.parquet(s"$root/d1")
  private def d2Df: DataFrame = spark.read.parquet(s"$root/d2")
  private def viewDir: String = s"$root/view"

  private def joined(f: DataFrame): DataFrame = {
    val (d1, d2) = (d1Df, d2Df)
    f.join(d1, f("pk") === d1("d1k"))
      .join(d2, f("sk") === d2("d2k"))
  }

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft-star-spec").toString
    val s = spark
    import s.implicits._
    // fact: 600 rows; pk ∈ 0..9 (d1 covers 0..7 — inner join DROPS
    // pk 8/9), sk ∈ 0..4; x the measure input
    (0 until 600).map(i => (i.toLong, (i % 10).toLong, (i % 5).toLong,
        i.toLong))
      .toDF("fid", "pk", "sk", "x")
      .repartition(3).write.parquet(s"$root/fact")
    (0 until 8).map(i => (i.toLong, s"b${i % 3}"))
      .toDF("d1k", "brand").write.parquet(s"$root/d1")
    (0 until 5).map(i => (i.toLong, s"n${i % 2}"))
      .toDF("d2k", "nat").write.parquet(s"$root/d2")
    AggView.buildIfAbsent(joined(factDf), Seq("brand", "nat"),
      Seq(AggView.Measure("sum_x", "x")), viewDir, kbParts = 4)
  }

  override def afterAll(): Unit = AggViewRewrite.clear()

  private def registerStar(): Unit = {
    AggViewRewrite.registerStar(spark, factDf,
      Seq((d1Df, Seq(("pk", "d1k"))), (d2Df, Seq(("sk", "d2k")))),
      viewDir)
    ()
  }

  private def mkViews(): Unit = {
    factDf.createOrReplaceTempView("star_fact")
    d1Df.createOrReplaceTempView("star_d1")
    d2Df.createOrReplaceTempView("star_d2")
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
    roots.exists(_.contains(viewDir)) &&
      !roots.exists(r => r.contains(s"$root/fact") ||
        r.contains(s"$root/d1") || r.contains(s"$root/d2"))
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val joinSql =
    """FROM star_fact
      |JOIN star_d1 ON pk = d1k
      |JOIN star_d2 ON sk = d2k""".stripMargin

  test("the grouped join aggregate plans onto the view and equals " +
      "the direct answer; key-subset rollup and global too") {
    AggViewRewrite.clear()
    mkViews()
    val q = s"""SELECT brand, nat, count(*) AS c, sum(x) AS sx
               |$joinSql GROUP BY brand, nat""".stripMargin
    val sub = s"""SELECT nat, count(*) AS c, sum(x) AS sx
                 |$joinSql GROUP BY nat""".stripMargin
    val glob = s"SELECT count(*) AS c, sum(x) AS sx $joinSql"
    val truths = Seq(q, sub, glob).map(x => sorted(spark.sql(x)))
    registerStar()
    Seq(q, sub, glob).zip(truths).foreach { case (x, truth) =>
      val r = spark.sql(x)
      assert(hitsView(r), r.queryExecution.optimizedPlan)
      assert(sorted(r) == truth, x)
    }
    AggViewRewrite.clear()
  }

  test("a key-equality probe on the join aggregate kb-prunes; the " +
      "inner join's inferred isnotnull(join key) is dropped as " +
      "tautological") {
    AggViewRewrite.clear()
    mkViews()
    val q = s"""SELECT brand, nat, sum(x) AS sx $joinSql
               |WHERE brand = 'b1' AND nat = 'n0'
               |GROUP BY brand, nat""".stripMargin
    val truth = sorted(spark.sql(q))
    registerStar()
    val r = spark.sql(q)
    assert(hitsView(r), r.queryExecution.optimizedPlan)
    assert(sorted(r) == truth && truth.size == 1)
    assert(r.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [kb"),
      r.queryExecution.executedPlan.toString)
    AggViewRewrite.clear()
  }

  test("hazards refuse: flat fact aggregate, wrong join keys, an " +
      "extra join, a non-key filter — all fall back to the scan") {
    AggViewRewrite.clear()
    mkViews()
    registerStar()
    // flat aggregate over the fact ALONE: the joined rollup dropped
    // pk 8/9 rows — serving it would be wrong, and it must not
    val flat = spark.sql("SELECT count(*) AS c FROM star_fact")
    assert(!hitsView(flat))
    assert(flat.collect().head.getLong(0) == 600L)
    // wrong join key pair
    val wrong = spark.sql(
      s"""SELECT brand, sum(x) AS sx FROM star_fact
         |JOIN star_d1 ON sk = d1k
         |JOIN star_d2 ON sk = d2k
         |GROUP BY brand""".stripMargin)
    assert(!hitsView(wrong))
    // an extra (self) join the declaration does not carry
    val extra = spark.sql(
      s"""SELECT brand, count(*) AS c $joinSql
         |JOIN (SELECT d1k AS zz FROM star_d1) ON pk = zz
         |GROUP BY brand""".stripMargin)
    assert(!hitsView(extra))
    // a filter on a non-key (fact) column
    val nonKey = spark.sql(
      s"""SELECT brand, count(*) AS c $joinSql
         |WHERE x > 100 GROUP BY brand""".stripMargin)
    assert(!hitsView(nonKey))
    AggViewRewrite.clear()
  }

  test("a dim change refuses: the rewrite falls back immediately " +
      "(listing pin) and refreshPins names the dim, demanding " +
      "re-registration") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    // isolated copy: this test mutates d1
    val r2 = Files.createTempDirectory("graft-star-dim").toString
    (0 until 100).map(i => (i.toLong, (i % 4).toLong, i.toLong))
      .toDF("fid", "pk", "x").write.parquet(s"$r2/fact")
    (0 until 4).map(i => (i.toLong, s"g$i")).toDF("d1k", "g")
      .write.parquet(s"$r2/d1")
    val f = spark.read.parquet(s"$r2/fact")
    val d = spark.read.parquet(s"$r2/d1")
    AggView.buildIfAbsent(f.join(d, f("pk") === d("d1k")), Seq("g"),
      Seq(AggView.Measure("sum_x", "x")), s"$r2/view", kbParts = 2)
    AggViewRewrite.registerStar(spark, f,
      Seq((d, Seq(("pk", "d1k")))), s"$r2/view")
    f.createOrReplaceTempView("star_dim_fact")
    d.createOrReplaceTempView("star_dim_d1")
    val q = """SELECT g, sum(x) AS sx FROM star_dim_fact
              |JOIN star_dim_d1 ON pk = d1k GROUP BY g""".stripMargin
    assert(scannedRoots(spark.sql(q)).exists(_.contains(s"$r2/view")))
    // the dim moves: a row lands in d1
    Seq((9L, "g9")).toDF("d1k", "g").write.mode("append")
      .parquet(s"$r2/d1")
    spark.read.parquet(s"$r2/d1")
      .createOrReplaceTempView("star_dim_d1")
    val after = spark.sql(q)
    assert(!scannedRoots(after).exists(_.contains(s"$r2/view")),
      after.queryExecution.optimizedPlan)
    val ref = AggViewRewrite.refreshPins(spark).collect().head
    assert(!ref.getBoolean(1) &&
      ref.getString(2).contains("dim table changed"), ref.getString(2))
    AggViewRewrite.clear()
  }

  test("fact-side IVM: append the joined delta to the view, land the " +
      "fact files, refresh re-verifies by scanning only the new " +
      "fact files' joined rows, and the rewrite serves the grown " +
      "answer") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    mkViews()
    registerStar()
    // fleet batch: 60 new fact rows in one file
    val delta = (600 until 660).map(i =>
        (i.toLong, (i % 10).toLong, (i % 5).toLong, i.toLong))
      .toDF("fid", "pk", "sk", "x")
    delta.coalesce(1).write.mode("append").parquet(s"$root/fact")
    AggView.append(joined(delta), viewDir)
    val ref = AggViewRewrite.refreshPins(spark).collect().head
    assert(ref.getBoolean(1), ref.getString(2))
    // fresh relation instance (the old temp view's listing predates
    // the append); the rewrite serves, and exactly
    factDf.createOrReplaceTempView("star_fact")
    val q = s"""SELECT brand, count(*) AS c, sum(x) AS sx
               |$joinSql GROUP BY brand""".stripMargin
    val r = spark.sql(q)
    assert(hitsView(r), r.queryExecution.optimizedPlan)
    val got = sorted(r)
    AggViewRewrite.clear()
    assert(got == sorted(spark.sql(q)))
  }

  test("registerStar refuses: a non-bare fact, a partitioned fact, " +
      "a dim sharing the fact's roots, and zero dims") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-ref").toString
    (0 until 10).map(i => (i.toLong, s"p${i % 2}", i.toLong))
      .toDF("k", "p", "x").write.partitionBy("p").parquet(s"$r2/pf")
    intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark,
        factDf.filter(col("x") > 0).select("pk"),
        Seq((d1Df, Seq(("pk", "d1k")))), viewDir)
    }
    val pe = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, spark.read.parquet(s"$r2/pf"),
        Seq((d1Df, Seq(("k", "d1k")))), viewDir)
    }
    assert(pe.getMessage.contains("unpartitioned"), pe.getMessage)
    val se = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, factDf,
        Seq((factDf, Seq(("pk", "pk")))), viewDir)
    }
    assert(se.getMessage.contains("self-join"), se.getMessage)
    intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, factDf, Nil, viewDir)
    }
    AggViewRewrite.clear()
  }
}
