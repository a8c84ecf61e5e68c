package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RendezvousSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def route(shards: Seq[String]): Map[Long, String] = {
    import spark.implicits._
    (0L until 2000L).toDF("k")
      .select(col("k"), Sampling.rendezvousShard(col("k"), shards).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("HRW: removing a shard remaps ONLY the rows that lived on it") {
    val all = Seq("s0", "s1", "s2", "s3", "s4")
    val before = route(all)
    val after = route(all.filterNot(_ == "s2"))
    before.foreach { case (k, sh) =>
      if (sh == "s2") assert(after(k) != "s2")
      else assert(after(k) == sh,
        s"key $k moved $sh -> ${after(k)} though s2's loss shouldn't touch it")
    }
    // and s2 actually held a meaningful share before
    assert(before.values.count(_ == "s2") > 200)
  }

  test("HRW: placement is balanced within a loose bound") {
    val counts = route(Seq("a", "b", "c", "d"))
      .values.groupBy(identity).view.mapValues(_.size)
    // 2000 keys over 4 shards: expect 500 each; allow generous slack
    counts.foreach { case (sh, n) =>
      assert(n > 350 && n < 650, s"shard $sh badly unbalanced: $n")
    }
  }

  test("HRW: adding a shard steals roughly 1/n, never reshuffles") {
    val before = route(Seq("s0", "s1", "s2"))
    val after = route(Seq("s0", "s1", "s2", "s3"))
    val moved = before.count { case (k, sh) => after(k) != sh }
    // every move must land on the NEW shard
    before.foreach { case (k, sh) =>
      if (after(k) != sh) assert(after(k) == "s3") }
    assert(moved > 300 && moved < 700, s"expected ~1/4 to move, got $moved")
  }
}
