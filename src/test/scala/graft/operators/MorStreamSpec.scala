package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestSession

/** The MergeOnRead CHANGE FEED: the batch window read (`changes`)
  * and the Structured Streaming tail (`changeStream` — the stock
  * parquet file stream over the atomically-renamed delta log), plus
  * the end-to-end loop: one CDC table feeding an artifact sink to
  * convergence, exactly once.
  */
class MorStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp() =
    Files.createTempDirectory("morstream").toUri.toString
      .stripSuffix("/") + "/tbl"

  private def base(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(k => (k, s"v$k", k * 10)).toDF("k", "v", "c")
  }

  private def ch(rows: Seq[(Long, String, Long)], op: String,
      seq: Long) = {
    import spark.implicits._
    rows.toDF("k", "v", "c")
      .withColumn("op", lit(op)).withColumn("seq", lit(seq))
  }

  test("changes(after, until) serves exactly the window's batches " +
      "with op/seq/batch; empty window keeps the schema") {
    val dir = tmp()
    MergeOnRead.create(base(20), dir, Seq("k"), nBuckets = 4)
    val b0 = MergeOnRead.append(ch(Seq((1L, "x", 11L)), "U", 1L), dir)
    val b1 = MergeOnRead.append(
      ch(Seq((2L, "y", 22L)), "U", 1L)
        .unionByName(ch(Seq((3L, "z", 0L)), "D", 2L)), dir)
    val all = MergeOnRead.changes(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("op"),
        r.getAs[Int]("batch"))).toSet
    assert(all == Set((1L, "U", b0), (2L, "U", b1), (3L, "D", b1)))
    // window after b0: only b1's rows
    val tail = MergeOnRead.changes(spark, dir, afterBatch = b0)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(tail == Set(2L, 3L))
    // bounded window: only b0
    assert(MergeOnRead.changes(spark, dir, untilBatch = b0)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L))
    // empty window: zero rows, full change schema
    val empty = MergeOnRead.changes(spark, dir, afterBatch = b1)
    assert(empty.count() == 0)
    assert(empty.columns.toSet ==
      Set("k", "v", "c", "op", "seq", "batch"))
  }

  test("a window spanning a compaction-GC'd batch refuses with the " +
      "missing ids named; gc=false keeps the feed open") {
    val dir = tmp()
    MergeOnRead.create(base(20), dir, Seq("k"), nBuckets = 4)
    val b0 = MergeOnRead.append(ch(Seq((1L, "x", 11L)), "U", 1L), dir)
    MergeOnRead.compact(spark, dir) // gc=true deletes batch dir b0
    val e = intercept[IllegalArgumentException](
      MergeOnRead.changes(spark, dir).collect())
    assert(e.getMessage.contains(b0.toString))
    // a window past the GC'd batch still serves
    val b1 = MergeOnRead.append(ch(Seq((2L, "y", 22L)), "U", 1L), dir)
    assert(MergeOnRead.changes(spark, dir, afterBatch = b0)
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // gc=false compaction folds but keeps the dir: feed stays open
    MergeOnRead.compact(spark, dir, gc = false)
    assert(MergeOnRead.changes(spark, dir, afterBatch = b0)
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("changeStream tails committed batches exactly once across " +
      "restarts on one checkpoint") {
    val dir = tmp()
    val ckpt = Files.createTempDirectory("morstream-ckpt").toString
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 4)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int)]
    def drain(): Unit = {
      val q = MergeOnRead.changeStream(spark, dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.select("k", "op", "batch").collect()
              .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val b0 = MergeOnRead.append(ch(Seq((1L, "x", 11L)), "U", 1L), dir)
    val b1 = MergeOnRead.append(ch(Seq((2L, "y", 22L)), "D", 1L), dir)
    drain()
    assert(got.toSet == Set((1L, "U", b0), (2L, "D", b1)))
    // restart on the same checkpoint: already-seen batches do NOT
    // replay; a new batch arrives exactly once
    val n = got.size
    val b2 = MergeOnRead.append(ch(Seq((3L, "z", 33L)), "U", 2L), dir)
    drain()
    assert(got.size == n + 1 && got.toSet.contains((3L, "U", b2)))
    // a torn append (hidden staging dir) is invisible to the tail
    drain()
    assert(got.size == n + 1)
  }

  test("end-to-end: the change stream feeds an AggView sink to " +
      "convergence, exactly once per micro-batch") {
    val dir = tmp()
    val ckpt = Files.createTempDirectory("morstream-agg-ckpt").toString
    val view = Files.createTempDirectory("morstream-aggview").toUri
      .toString.stripSuffix("/") + "/view"
    // MOR table = the source of truth; AggView = its materialized
    // rollup, built once from the base and maintained from the
    // change feed (an insert/delete CDC feed — AggView's retraction
    // algebra)
    import spark.implicits._
    val t0 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "v", "c")
    MergeOnRead.create(t0, dir, Seq("k"), nBuckets = 4)
    AggView.buildIfAbsent(t0.select("v", "c"), Seq("v"),
      Seq(AggView.Measure("c_sum", "c")), view, kbParts = 2)
    MergeOnRead.append(
      ch(Seq((4L, "b", 40L), (5L, "c", 50L)), "I", 1L), dir)
    MergeOnRead.append(ch(Seq((2L, "a", 20L)), "D", 1L), dir)
    val q = MergeOnRead.changeStream(spark, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        AggView.applyBatch(df.select("v", "c", "op"), id, view)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // converged view ≡ the live MOR table's rollup
    val served = AggView.read(spark, view).collect()
      .map(r => (r.getAs[String]("v"), r.getAs[Long]("cnt"),
        r.getAs[Long]("c_sum"))).toSet
    val want = MergeOnRead.read(spark, dir)
      .groupBy("v").agg(count(lit(1)).as("cnt"), sum("c").as("c_sum"))
      .collect().map(r => (r.getAs[String]("v"), r.getAs[Long]("cnt"),
        r.getAs[Long]("c_sum"))).toSet
    assert(served == want &&
      want == Set(("a", 1L, 10L), ("b", 2L, 70L), ("c", 1L, 50L)))
  }
}
