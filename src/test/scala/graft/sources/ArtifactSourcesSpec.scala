package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}

import graft.SparkTestSession
import graft.operators.{AggView, AnnIndex, Bm25Index, DedupIndex,
  LmIndex, MergeOnRead, VecStats}
import graft.operators.AggView.Measure

/** The SQL serve surface over the persisted artifacts: a pure-SQL
  * user reads AggView / VecStats state through registered sources,
  * and a key-complete predicate rides the same kb-pruned lookup plan
  * the Scala API serves.
  */
class ArtifactSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  private def facts(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map { i =>
      (s"g${i % 5}", i % 3, (i * 7 % 101).toLong)
    }.toDF("grp", "sub", "v")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).toSet

  test("CREATE TEMPORARY VIEW ... USING aggview serves the live view " +
      "from pure SQL; column pruning and asOfVersion time travel work") {
    val path = tmp("aggsrc")
    AggView.buildIfAbsent(facts(0, 120), Seq("grp", "sub"),
      Seq(Measure("v_sum", "v")), path, kbParts = 8)
    val asBuilt = AggView.versions(path).max
    AggView.append(facts(120, 200), path)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_aggsrc " +
      s"USING aggview OPTIONS (path '$path')")
    assert(rowsOf(spark.sql(
        "SELECT grp, sub, cnt, v_sum FROM graft_aggsrc")) ==
      rowsOf(AggView.read(spark, path)))
    // column pruning: a narrow projection still answers correctly
    assert(rowsOf(spark.sql("SELECT grp, v_sum FROM graft_aggsrc")) ==
      rowsOf(AggView.read(spark, path).select("grp", "v_sum")))
    assert(spark.sql("SELECT count(*) FROM graft_aggsrc").head().getLong(0)
      == AggView.read(spark, path).count())
    // time travel through the option — the pre-append version
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_aggsrc_v0 " +
      s"USING aggview OPTIONS (path '$path', asOfVersion '$asBuilt')")
    assert(rowsOf(spark.sql(
        "SELECT grp, sub, cnt, v_sum FROM graft_aggsrc_v0")) ==
      rowsOf(AggView.readAsOf(spark, path, asBuilt)))
    // SQL predicates answer exactly (engine re-evaluates above the
    // routed scan)
    assert(rowsOf(spark.sql(
        "SELECT grp, sub, cnt, v_sum FROM graft_aggsrc " +
          "WHERE grp = 'g1' AND sub = 2")) ==
      rowsOf(AggView.read(spark, path)
        .filter(col("grp") === "g1" && col("sub") === 2)))
  }

  test("a key-complete equality predicate routes through the " +
      "kb-pruned lookup plan (PartitionFilters + broadcast probe)") {
    val path = tmp("aggsrc-prune")
    AggView.buildIfAbsent(facts(0, 200), Seq("grp", "sub"),
      Seq(Measure("v_sum", "v")), path, kbParts = 8)
    // the spec pins the SAME function buildScan executes
    val routed = AggViewServe.plan(spark, path, None,
      Seq[Filter](EqualTo("grp", "g1"), EqualTo("sub", 2)))
    assert(rowsOf(routed) == rowsOf(AggView.read(spark, path)
      .filter(col("grp") === "g1" && col("sub") === 2)))
    val plan = routed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kb".r.findFirstIn(plan).isDefined,
      s"expected a kb partition filter in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the broadcast probe join in:\n$plan")
    // an incomplete key set falls back to the full read (no probe)
    val full = AggViewServe.plan(spark, path, None,
      Seq[Filter](EqualTo("grp", "g1")))
    assert(!full.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("CREATE TEMPORARY VIEW ... USING bm25 serves term-parameterized " +
      "retrieval from pure SQL, equal to the Scala score path") {
    import spark.implicits._
    val path = tmp("bmsrc")
    val docs = (0 until 40).map(i => (i.toLong,
      s"doc $i alpha word${i % 7} beta token${i % 11} gamma"))
      .toDF("doc_id", "text")
    Bm25Index.buildIfAbsent(docs, "text", "doc_id", path,
      tbParts = 8, dlParts = 4)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_bmsrc " +
      s"USING bm25 OPTIONS (path '$path', terms 'alpha,word1,token3')")
    assert(rowsOf(spark.sql(
        "SELECT doc_id, bm25 FROM graft_bmsrc")) ==
      rowsOf(Bm25Index.score(spark, path,
        Seq("alpha", "word1", "token3"))))
    // k1/b options change the scores the way the Scala API does
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_bmsrc_k " +
      s"USING bm25 OPTIONS (path '$path', terms 'alpha', " +
      "k1 '2.0', b '0.5')")
    assert(rowsOf(spark.sql("SELECT doc_id, bm25 FROM graft_bmsrc_k")) ==
      rowsOf(Bm25Index.score(spark, path, Seq("alpha"), 2.0, 0.5)))
  }

  test("spark.read.format(vecstats) serves the monitoring summary " +
      "from pure SQL") {
    import spark.implicits._
    val path = tmp("vssrc")
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 6).map(d => ((i * 31 + d * 7) % 201 - 100).toLong))
    }.toDF("vec_id", "q")
    VecStats.buildIfAbsent(corpus, "q", "vec_id", path)
    assert(rowsOf(spark.read.format("vecstats").option("path", path)
        .load()) == rowsOf(VecStats.summary(spark, path)))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_vssrc " +
      s"USING vecstats OPTIONS (path '$path')")
    assert(rowsOf(spark.sql(
        "SELECT dim, n, mean, std FROM graft_vssrc WHERE dim < 3")) ==
      rowsOf(VecStats.summary(spark, path).filter(col("dim") < 3)))
    // asOfVersion time travel (aggview option parity): the pre-append
    // stats, not the live ones
    val asBuilt = VecStats.versions(path).max
    VecStats.append(corpus.limit(0).unionByName(
      Seq((100L, (0 until 6).map(_.toLong))).toDF("vec_id", "q")), path)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_vssrc_v0 " +
      s"USING vecstats OPTIONS (path '$path', asOfVersion '$asBuilt')")
    assert(rowsOf(spark.sql("SELECT dim, n, mean, std FROM graft_vssrc_v0"))
      == rowsOf(VecStats.summaryAsOf(spark, path, asBuilt)))
    assert(rowsOf(spark.sql("SELECT dim, n, mean, std FROM graft_vssrc_v0"))
      != rowsOf(VecStats.summary(spark, path)))
  }

  test("CREATE TEMPORARY VIEW ... USING annindex serves IVF search " +
      "over a SQL probe view, equal to the Scala searchInt path") {
    import spark.implicits._
    val path = tmp("annsrc")
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 80L).map(i =>
      (i, Seq.fill(8)((rnd.nextInt(401) - 200).toLong)))
      .toDF("vec_id", "q")
    val cents = {
      val r2 = new scala.util.Random(5)
      Seq.fill(3)(Seq.fill(8)((r2.nextInt(401) - 200).toLong))
    }
    AnnIndex.buildIfAbsent(corpus, "q", "vec_id", cents, path)
    corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("q"))
      .createOrReplaceTempView("graft_annsrc_probes")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_annsrc_hits " +
      s"USING annindex OPTIONS (path '$path', " +
      "probeView 'graft_annsrc_probes', nprobe '2', k '3')")
    assert(rowsOf(spark.sql(
        "SELECT probe_id, vec_id, sim, rank FROM graft_annsrc_hits")) ==
      rowsOf(AnnIndex.searchInt(spark, path,
        spark.table("graft_annsrc_probes"), "probe_id", "q", 2, 3)))
    // column pruning through the source still answers correctly
    assert(spark.sql("SELECT count(*) FROM graft_annsrc_hits")
        .head().getLong(0) == 4 * 3)
    // a probe view REPLACED between scans is picked up (the relation
    // resolves the view at scan time, not at creation)
    corpus.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("probe_id"), col("q"))
      .createOrReplaceTempView("graft_annsrc_probes")
    assert(spark.sql(
        "SELECT DISTINCT probe_id FROM graft_annsrc_hits")
      .head().getLong(0) == 7L)
  }

  test("the annindex source routes by the artifact's kind: a pq " +
      "index serves ADC, an sq8 index the sq8 scorer — same SQL " +
      "surface") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val corpus = (0L until 60L).map(i =>
      (i, Seq.fill(8)((rnd.nextInt(401) - 200).toLong)))
      .toDF("vec_id", "q")
    corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("q"))
      .createOrReplaceTempView("graft_annkind_probes")
    // 2 subvectors × 4 centroids of dim 4 each
    val books = {
      val r2 = new scala.util.Random(9)
      Seq.fill(2)(Seq.fill(4)(Seq.fill(4)((r2.nextInt(401) - 200).toLong)))
    }
    val pqPath = tmp("annsrc-pq")
    AnnIndex.buildPqIfAbsent(corpus, "q", "vec_id", books, pqPath)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_annkind_pq " +
      s"USING annindex OPTIONS (path '$pqPath', " +
      "probeView 'graft_annkind_probes', k '4')")
    assert(rowsOf(spark.sql(
        "SELECT probe_id, vec_id, adc, rank FROM graft_annkind_pq")) ==
      rowsOf(AnnIndex.pqSearchInt(spark, pqPath,
        spark.table("graft_annkind_probes"), "probe_id", "q", 4)))
    val sqPath = tmp("annsrc-sq8")
    AnnIndex.buildSq8IfAbsent(corpus, "q", "vec_id", sqPath)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_annkind_sq8 " +
      s"USING annindex OPTIONS (path '$sqPath', " +
      "probeView 'graft_annkind_probes', k '4')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_annkind_sq8")) ==
      rowsOf(AnnIndex.sq8SearchInt(spark, sqPath,
        spark.table("graft_annkind_probes"), "probe_id", "q", 4)))
  }

  test("CREATE TEMPORARY VIEW ... USING dedupindex serves the " +
      "exact+near ingest screen over a SQL probe view") {
    import spark.implicits._
    val path = tmp("ddsrc")
    def body(f: Int) = (0 until 8).map(j => java.lang.Long.toHexString(
      (f * 1000003L + j) * -0x61c8864680b583ebL)).mkString(" ")
    val corpus = (0 until 30).map(i =>
      (i.toLong, s"${body(i / 3)} end v${i % 3}")).toDF("doc_id", "text")
    DedupIndex.buildIfAbsent(corpus, "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, path,
      kbParts = 4, sbParts = 4)
    // doc 0 verbatim (exact), doc 3 with an edit (near), one novel
    corpus.filter(col("doc_id") === 0L)
      .select((col("doc_id") + 900).as("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") === 3L)
        .select((col("doc_id") + 900).as("doc_id"),
          concat(col("text"), lit(" edit")).as("text")))
      .unionByName(Seq((999L, "wholly novel text nothing shared here"))
        .toDF("doc_id", "text"))
      .createOrReplaceTempView("graft_ddsrc_probes")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_ddsrc_flagged " +
      s"USING dedupindex OPTIONS (path '$path', " +
      "probeView 'graft_ddsrc_probes', thresholdTenths '5')")
    assert(rowsOf(spark.sql("SELECT new_id, corpus_id, kind, matches, " +
        "est_jaccard FROM graft_ddsrc_flagged")) ==
      rowsOf(DedupIndex.screen(spark, path,
        spark.table("graft_ddsrc_probes"), "text", "doc_id", 5)))
    // the verbatim copy flags exact; the novel doc flags nothing
    val kinds = spark.sql("SELECT new_id, kind FROM graft_ddsrc_flagged")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kinds.contains((900L, "exact")))
    assert(!kinds.exists(_._1 == 999L))
  }

  test("CREATE TEMPORARY VIEW ... USING lmindex scores a SQL docs " +
      "view through the pruned scoreBatch serve, equal to score") {
    import spark.implicits._
    val path = tmp("lmsrc")
    val docs = (0 until 40).map { i =>
      (i.toLong, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} " +
        s"tok${(i + 3) % 7} word$i tail${i % 3}")
    }.toDF("doc_id", "text")
    LmIndex.buildIfAbsent(docs.filter(col("doc_id") % 2 === 0),
      "text", "doc_id", path)
    docs.filter(col("doc_id") < 6)
      .createOrReplaceTempView("graft_lmsrc_docs")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_lmsrc_scored " +
      s"USING lmindex OPTIONS (path '$path', " +
      "docsView 'graft_lmsrc_docs')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_lmsrc_scored")) ==
      rowsOf(LmIndex.score(spark, path,
        docs.filter(col("doc_id") < 6), "doc_id", "text")))
    // alpha option changes the backoff the way the Scala API does
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_lmsrc_a " +
      s"USING lmindex OPTIONS (path '$path', " +
      "docsView 'graft_lmsrc_docs', alpha '0.2')")
    assert(rowsOf(spark.sql("SELECT * FROM graft_lmsrc_a")) ==
      rowsOf(LmIndex.score(spark, path,
        docs.filter(col("doc_id") < 6), "doc_id", "text", 0.2)))
  }

  test("CREATE TEMPORARY VIEW ... USING mor serves the live CDC fold " +
      "and version-optioned time travel from pure SQL") {
    import spark.implicits._
    val dir = tmp("morsrc")
    val base = (0L until 50L).map(k => (k, s"v$k", k * 10))
      .toDF("k", "v", "c")
    MergeOnRead.create(base, dir, Seq("k"), nBuckets = 4)
    val v1 = MergeOnRead.versions(dir).max
    MergeOnRead.append(
      base.filter(col("k") % 7 === 0)
          .withColumn("c", col("c") + 1000)
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        .unionByName(base.filter(col("k") % 5 === 0)
          .withColumn("op", lit("D")).withColumn("seq", lit(2L))),
      dir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_morsrc " +
      s"USING mor OPTIONS (path '$dir')")
    assert(rowsOf(spark.sql("SELECT k, v, c FROM graft_morsrc")) ==
      rowsOf(MergeOnRead.read(spark, dir)))
    // deletes outrank same-batch updates by seq; survivors updated
    val live = spark.sql("SELECT k, c FROM graft_morsrc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!live.contains(35L) && live(7L) == 1070L && live(1L) == 10L)
    // version option = the as-created snapshot, no deltas
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_morsrc_v1 " +
      s"USING mor OPTIONS (path '$dir', version '$v1')")
    assert(rowsOf(spark.sql("SELECT k, v, c FROM graft_morsrc_v1")) ==
      rowsOf(MergeOnRead.readAt(spark, dir, v1)))
    assert(spark.sql("SELECT count(*) FROM graft_morsrc_v1")
      .head().getLong(0) == 50L)
    // zone-mapped table: pushed WHERE filters route through
    // readWhere — same rows as the unpruned view, and the same rows
    // the Scala readWhere serves
    MergeOnRead.compact(spark, dir, clusterBy = Seq("c"),
      filesPerBucket = 3)
    MergeOnRead.buildZoneMap(spark, dir, Seq("c", "k"), Nil)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_morsrc_z " +
      s"USING mor OPTIONS (path '$dir')")
    val sqlRows = rowsOf(spark.sql(
      "SELECT k, v, c FROM graft_morsrc_z WHERE c >= 100 AND c <= 300"))
    assert(sqlRows == rowsOf(MergeOnRead.read(spark, dir)
      .filter(col("c").between(100L, 300L)).select("k", "v", "c")))
    import org.apache.spark.sql.sources.{GreaterThanOrEqual,
      LessThanOrEqual}
    assert(sqlRows == rowsOf(MergeOnRead.readWhere(spark, dir,
      Seq(GreaterThanOrEqual("c", 100L), LessThanOrEqual("c", 300L)))
      .filter(col("c").between(100L, 300L)).select("k", "v", "c")))
  }

  test("spark.read.format(indexmeta) surfaces the retained manifest " +
      "versions of any artifact dir, uniformly") {
    val path = tmp("metasrc")
    AggView.buildIfAbsent(facts(0, 100), Seq("grp"),
      Seq(Measure("v_sum", "v")), path, kbParts = 4)
    AggView.append(facts(100, 140), path)
    AggView.append(facts(140, 160), path)
    val meta = spark.read.format("indexmeta").option("path", path).load()
    val rows = meta.orderBy("version").collect()
    assert(rows.map(_.getLong(0)).toSeq == AggView.versions(path))
    // exactly the max version is live; delta counts track the appends
    assert(rows.filter(_.getBoolean(1)).map(_.getLong(0)).toSeq ==
      Seq(rows.last.getLong(0)))
    assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.forall(_.getString(5).nonEmpty))
    // a fresh append is visible to the NEXT scan (resolved per scan)
    AggView.append(facts(160, 180), path)
    assert(meta.count() == AggView.versions(path).size)
    // SQL view over it, filtered
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_metasrc " +
      s"USING indexmeta OPTIONS (path '$path')")
    assert(spark.sql(
        "SELECT version FROM graft_metasrc WHERE live").count() == 1)
  }

  test("probe-parameterized sources fail fast on a missing required " +
      "option") {
    val e1 = intercept[IllegalArgumentException](spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW graft_bad1 " +
        "USING annindex OPTIONS (path '/nope')"))
    assert(e1.getMessage.contains("probeView"))
    val e2 = intercept[IllegalArgumentException](spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW graft_bad2 " +
        "USING lmindex OPTIONS (path '/nope')"))
    assert(e2.getMessage.contains("docsView"))
  }
}
