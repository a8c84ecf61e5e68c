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
      Seq(AggView.StarDim(d1Df, Seq(("pk", "d1k"))),
        AggView.StarDim(d2Df, Seq(("sk", "d2k")))),
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
    // the shared serve path: DERIVED-key grouping and DISTINCT over
    // a view key work over the star too
    val drv = s"""SELECT substr(brand, 2, 1) AS bd,
                 |  count(DISTINCT nat) AS dn, sum(x) AS sx
                 |$joinSql GROUP BY substr(brand, 2, 1)""".stripMargin
    val truths = Seq(q, sub, glob, drv).map(x => sorted(spark.sql(x)))
    registerStar()
    Seq(q, sub, glob, drv).zip(truths).foreach { case (x, truth) =>
      val r = spark.sql(x)
      assert(hitsView(r), s"$x\n${r.queryExecution.optimizedPlan}")
      assert(sorted(r) == truth, x)
    }
    AggViewRewrite.clear()
  }

  test("ROLLUP / GROUPING SETS over the star join serve from the " +
      "view through the Expand shape; a rollup over a PARTIAL star " +
      "needs proveDims and refuses without it") {
    AggViewRewrite.clear()
    mkViews()
    val roll = s"""SELECT brand, nat, count(*) AS c, sum(x) AS sx
                  |$joinSql GROUP BY ROLLUP(brand, nat)""".stripMargin
    val sets = s"""SELECT brand, nat, sum(x) AS sx
                  |$joinSql
                  |GROUP BY GROUPING SETS ((brand), (nat), ())
                  |""".stripMargin
    val truths = Seq(roll, sets).map(x => sorted(spark.sql(x)))
    registerStar()
    Seq(roll, sets).zip(truths).foreach { case (x, truth) =>
      val r = spark.sql(x)
      assert(hitsView(r), s"$x\n${r.queryExecution.optimizedPlan}")
      assert(sorted(r) == truth, x)
    }
    // a rollup joining only ONE declared dim is a PARTIAL star:
    // without proveDims it must refuse (inner multiplicity)
    val part = """SELECT brand, count(*) AS c
                 |FROM star_fact JOIN star_d1 ON pk = d1k
                 |GROUP BY ROLLUP(brand)""".stripMargin
    assert(!scannedRoots(spark.sql(part)).exists(_.contains(viewDir)),
      spark.sql(part).queryExecution.optimizedPlan)
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
      Seq(AggView.StarDim(d, Seq(("pk", "d1k")))), s"$r2/view")
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

  test("registerStar refuses: a non-bare fact, a dim sharing the " +
      "fact's roots, colliding fact/dim column names, and zero dims") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-ref").toString
    intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark,
        factDf.filter(col("x") > 0).select("pk"),
        Seq(AggView.StarDim(d1Df, Seq(("pk", "d1k")))), viewDir)
    }
    val se = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, factDf,
        Seq(AggView.StarDim(factDf, Seq(("pk", "pk")))), viewDir)
    }
    assert(se.getMessage.contains("self-join"), se.getMessage)
    // a dim whose column names collide with the fact's: the refresh
    // join resolves by name, so the registration refuses up front
    (0 until 8).map(i => (i.toLong, i.toLong))
      .toDF("d1k", "x").write.parquet(s"$r2/clash")
    val ce = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, factDf,
        Seq(AggView.StarDim(spark.read.parquet(s"$r2/clash"),
          Seq(("pk", "d1k")))),
        viewDir)
    }
    assert(ce.getMessage.contains("disjoint"), ce.getMessage)
    intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, factDf, Nil, viewDir)
    }
    AggViewRewrite.clear()
  }

  test("a hive-PARTITIONED star fact: buildStarIfAbsent over the " +
      "joined star (partition column as a view key), the rewrite " +
      "serves, an append into a NEW partition directory refreshes " +
      "and serves the grown answer") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-part").toString
    (0 until 300).map(i => (i.toLong, (i % 4).toLong, i.toLong,
        s"pd${i % 2}"))
      .toDF("fid", "pk", "x", "pd")
      .write.partitionBy("pd").parquet(s"$r2/fact")
    (0 until 4).map(i => (i.toLong, s"g${i % 2}")).toDF("d1k", "g")
      .write.parquet(s"$r2/d1")
    def f = spark.read.parquet(s"$r2/fact")
    def d = spark.read.parquet(s"$r2/d1")
    val dims = Seq(AggView.StarDim(d, Seq(("pk", "d1k"))))
    AggView.buildStarIfAbsent(f, dims, Seq("g", "pd"),
      Seq(AggView.Measure("sum_x", "x")), s"$r2/view", kbParts = 2)
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view")
    def mk(): Unit = {
      f.createOrReplaceTempView("star_pf")
      d.createOrReplaceTempView("star_pd1")
    }
    mk()
    val q = """SELECT g, pd, count(*) AS c, sum(x) AS sx
              |FROM star_pf JOIN star_pd1 ON pk = d1k
              |GROUP BY g, pd""".stripMargin
    val r = spark.sql(q)
    assert(scannedRoots(r).exists(_.contains(s"$r2/view")) &&
      !scannedRoots(r).exists(_.contains(s"$r2/fact")),
      r.queryExecution.optimizedPlan)
    val got1 = sorted(r)
    AggViewRewrite.clear()
    assert(got1 == sorted(spark.sql(q)))
    // append into a partition directory that did not exist at
    // registration — the delta scan must resolve pd via basePath
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view")
    val delta = (300 until 360).map(i =>
        (i.toLong, (i % 4).toLong, i.toLong, "pd9"))
      .toDF("fid", "pk", "x", "pd")
    delta.coalesce(1).write.mode("append").partitionBy("pd")
      .parquet(s"$r2/fact")
    val dd = d
    AggView.append(
      delta.join(dd, delta("pk") === dd("d1k")), s"$r2/view")
    val ref = AggViewRewrite.refreshPins(spark).collect().head
    assert(ref.getBoolean(1), ref.getString(2))
    mk()
    val r3 = spark.sql(q)
    assert(scannedRoots(r3).exists(_.contains(s"$r2/view")),
      r3.queryExecution.optimizedPlan)
    val got3 = sorted(r3)
    AggViewRewrite.clear()
    assert(got3 == sorted(spark.sql(q)))
    assert(got3 != got1)
  }

  test("proveDims licenses PARTIAL-star matching: a query joining " +
      "only one dim — or none at all — serves from the view and " +
      "equals the direct answer; without the proof, partial " +
      "matching never fires") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-partial").toString
    // FULL coverage: pk ∈ 0..7 all in d1, sk ∈ 0..4 all in d2
    (0 until 200).map(i => (i.toLong, (i % 8).toLong, (i % 5).toLong,
        i.toLong))
      .toDF("fid", "pk", "sk", "x")
      .repartition(2).write.parquet(s"$r2/fact")
    (0 until 8).map(i => (i.toLong, s"b${i % 3}"))
      .toDF("d1k", "brand").write.parquet(s"$r2/d1")
    (0 until 5).map(i => (i.toLong, s"n${i % 2}"))
      .toDF("d2k", "nat").write.parquet(s"$r2/d2")
    def f = spark.read.parquet(s"$r2/fact")
    def d1 = spark.read.parquet(s"$r2/d1")
    def d2 = spark.read.parquet(s"$r2/d2")
    val dims = Seq(AggView.StarDim(d1, Seq(("pk", "d1k"))),
      AggView.StarDim(d2, Seq(("sk", "d2k"))))
    AggView.buildStarIfAbsent(f, dims, Seq("brand", "nat"),
      Seq(AggView.Measure("sum_x", "x")), s"$r2/view", kbParts = 4)
    def mk(): Unit = {
      f.createOrReplaceTempView("sp_fact")
      d1.createOrReplaceTempView("sp_d1")
      d2.createOrReplaceTempView("sp_d2")
    }
    mk()
    val partialQ = """SELECT brand, count(*) AS c, sum(x) AS sx
                     |FROM sp_fact JOIN sp_d1 ON pk = d1k
                     |GROUP BY brand""".stripMargin
    val flatQ = "SELECT count(*) AS c, sum(x) AS sx FROM sp_fact"
    val probeQ = """SELECT brand, sum(x) AS sx
                   |FROM sp_fact JOIN sp_d1 ON pk = d1k
                   |WHERE brand = 'b1' GROUP BY brand""".stripMargin
    // a ROLLUP over the partial star: the Expand path under the
    // same proveDims license
    val rollQ = """SELECT brand, count(*) AS c, sum(x) AS sx
                  |FROM sp_fact JOIN sp_d1 ON pk = d1k
                  |GROUP BY ROLLUP(brand)""".stripMargin
    val truths = Seq(partialQ, flatQ, probeQ, rollQ)
      .map(x => sorted(spark.sql(x)))
    // WITHOUT the proof: partial and flat queries fall back
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view")
    Seq(partialQ, flatQ, rollQ).foreach { x =>
      assert(!scannedRoots(spark.sql(x))
        .exists(_.contains(s"$r2/view")), x)
    }
    AggViewRewrite.clear()
    // WITH the proof: both dims neutral, partial/flat/probe serve
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view",
      proveDims = true)
    assert(AggViewRewrite.status(spark).collect()
      .head.getString(1).contains("(neutral)"))
    Seq(partialQ, flatQ, probeQ, rollQ).zip(truths).foreach {
      case (x, truth) =>
        val r = spark.sql(x)
        val roots = scannedRoots(r)
        assert(roots.exists(_.contains(s"$r2/view")) &&
          !roots.exists(_.contains(s"$r2/fact")),
          s"$x\n${r.queryExecution.optimizedPlan}")
        assert(sorted(r) == truth, x)
    }
    AggViewRewrite.clear()
  }

  test("proveDims refuses a non-unique dim key and a dim that does " +
      "not cover every fact row") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-proof").toString
    (0 until 100).map(i => (i.toLong, (i % 10).toLong, i.toLong))
      .toDF("fid", "pk", "x").write.parquet(s"$r2/fact")
    // dup: key 3 twice
    ((0 until 10) :+ 3).map(i => (i.toLong, s"g$i")).toDF("d1k", "g")
      .write.parquet(s"$r2/dup")
    // short: covers only 0..7 (fact has pk 8, 9)
    (0 until 8).map(i => (i.toLong, s"g$i")).toDF("d1k", "g")
      .write.parquet(s"$r2/short")
    def f = spark.read.parquet(s"$r2/fact")
    AggView.buildStarIfAbsent(f,
      Seq(AggView.StarDim(spark.read.parquet(s"$r2/dup"),
        Seq(("pk", "d1k")))),
      Seq("g"), Seq(AggView.Measure("sum_x", "x")), s"$r2/v1",
      kbParts = 2)
    val ue = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, f,
        Seq(AggView.StarDim(spark.read.parquet(s"$r2/dup"),
          Seq(("pk", "d1k")))),
        s"$r2/v1", proveDims = true)
    }
    assert(ue.getMessage.contains("not unique"), ue.getMessage)
    AggView.buildStarIfAbsent(f,
      Seq(AggView.StarDim(spark.read.parquet(s"$r2/short"),
        Seq(("pk", "d1k")))),
      Seq("g"), Seq(AggView.Measure("sum_x", "x")), s"$r2/v2",
      kbParts = 2)
    val ce = intercept[IllegalArgumentException] {
      AggViewRewrite.registerStar(spark, f,
        Seq(AggView.StarDim(spark.read.parquet(s"$r2/short"),
          Seq(("pk", "d1k")))),
        s"$r2/v2", proveDims = true)
    }
    assert(ce.getMessage.contains("does not cover"), ce.getMessage)
    AggViewRewrite.clear()
  }

  test("an appended fact row with no dim match DEMOTES the neutral " +
      "flags at refresh: partial-star serving stops, full-star " +
      "serving continues exactly; a LEFT-OUT dim change also stops " +
      "partial serving (fresh-listing probe)") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-demote").toString
    (0 until 120).map(i => (i.toLong, (i % 4).toLong, (i % 3).toLong,
        i.toLong))
      .toDF("fid", "pk", "sk", "x").write.parquet(s"$r2/fact")
    (0 until 4).map(i => (i.toLong, s"g$i")).toDF("d1k", "g")
      .write.parquet(s"$r2/d1")
    (0 until 3).map(i => (i.toLong, s"h$i")).toDF("d2k", "h")
      .write.parquet(s"$r2/d2")
    def f = spark.read.parquet(s"$r2/fact")
    def d1 = spark.read.parquet(s"$r2/d1")
    def d2 = spark.read.parquet(s"$r2/d2")
    def dims = Seq(AggView.StarDim(d1, Seq(("pk", "d1k"))),
      AggView.StarDim(d2, Seq(("sk", "d2k"))))
    AggView.buildStarIfAbsent(f, dims, Seq("g", "h"),
      Seq(AggView.Measure("sum_x", "x")), s"$r2/view", kbParts = 2)
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view",
      proveDims = true)
    def mk(): Unit = {
      f.createOrReplaceTempView("sd_fact")
      d1.createOrReplaceTempView("sd_d1")
      d2.createOrReplaceTempView("sd_d2")
    }
    mk()
    val partialQ = """SELECT g, sum(x) AS sx
                     |FROM sd_fact JOIN sd_d1 ON pk = d1k
                     |GROUP BY g""".stripMargin
    val fullQ = """SELECT g, h, sum(x) AS sx
                  |FROM sd_fact JOIN sd_d1 ON pk = d1k
                  |JOIN sd_d2 ON sk = d2k
                  |GROUP BY g, h""".stripMargin
    assert(scannedRoots(spark.sql(partialQ))
      .exists(_.contains(s"$r2/view")))
    // fleet batch with an UNCOVERED row: pk=9 has no d1 match — the
    // joined delta drops it, the view stays the joined rollup, but
    // coverage is broken and partial serving must stop
    val delta = Seq((900L, 9L, 0L, 1000L), (901L, 1L, 1L, 50L))
      .toDF("fid", "pk", "sk", "x")
    delta.coalesce(1).write.mode("append").parquet(s"$r2/fact")
    val (dd1, dd2) = (d1, d2)
    AggView.append(delta
      .join(dd1, delta("pk") === dd1("d1k"))
      .join(dd2, delta("sk") === dd2("d2k")), s"$r2/view")
    val ref = AggViewRewrite.refreshPins(spark).collect().head
    assert(ref.getBoolean(1), ref.getString(2))
    assert(ref.getString(2).contains("coverage lost"), ref.getString(2))
    mk()
    // partial: falls back (and the direct answer now INCLUDES the
    // uncovered pk=9 row under d1? no — pk=9 has no d1 row, so the
    // partial join drops it too; the point is the VIEW cannot know
    // that for future appends, so it refuses)
    assert(!scannedRoots(spark.sql(partialQ))
      .exists(_.contains(s"$r2/view")))
    // full: still serves, still exact
    val rFull = spark.sql(fullQ)
    assert(scannedRoots(rFull).exists(_.contains(s"$r2/view")),
      rFull.queryExecution.optimizedPlan)
    val gotFull = sorted(rFull)
    AggViewRewrite.clear()
    assert(gotFull == sorted(spark.sql(fullQ)))
    // fresh-listing probe: re-prove on the still-covered base, then
    // move the left-out dim UNDERNEATH the registration — partial
    // matching must stop even though the query never scans d2
    val r3 = Files.createTempDirectory("graft-star-leftout").toString
    (0 until 60).map(i => (i.toLong, (i % 4).toLong, (i % 3).toLong,
        i.toLong))
      .toDF("fid", "pk", "sk", "x").write.parquet(s"$r3/fact")
    (0 until 4).map(i => (i.toLong, s"g$i")).toDF("d1k", "g")
      .write.parquet(s"$r3/d1")
    (0 until 3).map(i => (i.toLong, s"h$i")).toDF("d2k", "h")
      .write.parquet(s"$r3/d2")
    def f3 = spark.read.parquet(s"$r3/fact")
    def e1 = spark.read.parquet(s"$r3/d1")
    def e2 = spark.read.parquet(s"$r3/d2")
    val dims3 = Seq(AggView.StarDim(e1, Seq(("pk", "d1k"))),
      AggView.StarDim(e2, Seq(("sk", "d2k"))))
    AggView.buildStarIfAbsent(f3, dims3, Seq("g", "h"),
      Seq(AggView.Measure("sum_x", "x")), s"$r3/view", kbParts = 2)
    AggViewRewrite.registerStar(spark, f3, dims3, s"$r3/view",
      proveDims = true)
    f3.createOrReplaceTempView("lo_fact")
    e1.createOrReplaceTempView("lo_d1")
    val loQ = """SELECT g, sum(x) AS sx
                |FROM lo_fact JOIN lo_d1 ON pk = d1k
                |GROUP BY g""".stripMargin
    assert(scannedRoots(spark.sql(loQ))
      .exists(_.contains(s"$r3/view")))
    Seq((9L, "h9")).toDF("d2k", "h").write.mode("append")
      .parquet(s"$r3/d2")
    assert(!scannedRoots(spark.sql(loQ))
      .exists(_.contains(s"$r3/view")),
      spark.sql(loQ).queryExecution.optimizedPlan)
    AggViewRewrite.clear()
  }

  test("LEFT-join star: null-extended groups serve exactly; with " +
      "proveDims (uniqueness only) flat serving works DESPITE " +
      "unmatched fact rows; an optimizer-converted inner join over " +
      "the left dim serves under a null-rejecting key filter; a " +
      "plain inner join and a dim-leg filter under the left join " +
      "fall back") {
    AggViewRewrite.clear()
    val s = spark
    import s.implicits._
    val r2 = Files.createTempDirectory("graft-star-leftjoin").toString
    // pk ∈ 0..9 but d1 covers only 0..7 — pk 8/9 rows NULL-EXTEND
    // (they would refuse an inner proveDims; left needs uniqueness
    // only). sk ∈ 0..3 fully covered by d2 (also left).
    (0 until 400).map(i => (i.toLong, (i % 10).toLong, (i % 4).toLong,
        i.toLong))
      .toDF("fid", "pk", "sk", "x")
      .repartition(2).write.parquet(s"$r2/fact")
    (0 until 8).map(i => (i.toLong, s"g${i % 3}")).toDF("d1k", "g")
      .write.parquet(s"$r2/d1")
    (0 until 4).map(i => (i.toLong, s"h${i % 2}")).toDF("d2k", "h")
      .write.parquet(s"$r2/d2")
    def f = spark.read.parquet(s"$r2/fact")
    def d1 = spark.read.parquet(s"$r2/d1")
    def d2 = spark.read.parquet(s"$r2/d2")
    val dims = Seq(
      AggView.StarDim(d1, Seq(("pk", "d1k")), joinType = "left"),
      AggView.StarDim(d2, Seq(("sk", "d2k")), joinType = "left"))
    AggView.buildStarIfAbsent(f, dims, Seq("g", "h"),
      Seq(AggView.Measure("sum_x", "x")), s"$r2/view", kbParts = 2)
    def mk(): Unit = {
      f.createOrReplaceTempView("lj_fact")
      d1.createOrReplaceTempView("lj_d1")
      d2.createOrReplaceTempView("lj_d2")
    }
    mk()
    val grouped = """SELECT g, h, count(*) AS c, sum(x) AS sx
                    |FROM lj_fact LEFT JOIN lj_d1 ON pk = d1k
                    |LEFT JOIN lj_d2 ON sk = d2k
                    |GROUP BY g, h""".stripMargin
    val partial = """SELECT g, count(*) AS c, sum(x) AS sx
                    |FROM lj_fact LEFT JOIN lj_d1 ON pk = d1k
                    |GROUP BY g""".stripMargin
    val flat = "SELECT count(*) AS c, sum(x) AS sx FROM lj_fact"
    val innerConv = """SELECT g, sum(x) AS sx
                      |FROM lj_fact LEFT JOIN lj_d1 ON pk = d1k
                      |WHERE g = 'g1' GROUP BY g""".stripMargin
    val truths = Seq(grouped, partial, flat, innerConv)
      .map(x => sorted(spark.sql(x)))
    AggViewRewrite.registerStar(spark, f, dims, s"$r2/view",
      proveDims = true)
    // null-extended groups present: the direct grouped answer has a
    // (null, h) group from pk 8/9 — and the served one must match it
    assert(truths.head.exists(_.startsWith("[null,")), truths.head)
    Seq(grouped, partial, flat, innerConv).zip(truths).foreach {
      case (x, truth) =>
        val r = spark.sql(x)
        val roots = scannedRoots(r)
        assert(roots.exists(_.contains(s"$r2/view")) &&
          !roots.exists(_.contains(s"$r2/fact")),
          s"$x\n${r.queryExecution.optimizedPlan}")
        assert(sorted(r) == truth, x)
    }
    // a PLAIN inner join over the left dim: the inferred
    // IsNotNull(d1k) is the only null-rejecter, survives, and is not
    // a view key — honest fallback, and the answers still agree
    val plainInner = """SELECT g, sum(x) AS sx
                       |FROM lj_fact JOIN lj_d1 ON pk = d1k
                       |GROUP BY g""".stripMargin
    assert(!scannedRoots(spark.sql(plainInner))
      .exists(_.contains(s"$r2/view")),
      spark.sql(plainInner).queryExecution.optimizedPlan)
    // a pre-join filter on the dim LEG under the left join changes
    // which rows null-extend — never served
    val (ff, dd1) = (f, d1)
    val dd1f = dd1.filter(dd1("d1k") < 4L)
    val legAgg = ff.join(dd1f, ff("pk") === dd1f("d1k"), "left")
      .groupBy("g")
      .agg(count(lit(1)).as("c"), sum("x").as("sx"))
    assert(!scannedRoots(legAgg).exists(_.contains(s"$r2/view")),
      legAgg.queryExecution.optimizedPlan)
    AggViewRewrite.clear()
  }
}
