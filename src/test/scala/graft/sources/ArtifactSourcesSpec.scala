package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}

import graft.SparkTestSession
import graft.operators.{AggView, Bm25Index, VecStats}
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
  }
}
