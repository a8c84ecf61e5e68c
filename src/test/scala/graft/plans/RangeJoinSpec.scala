package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.IpMath

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftBridge.addStrategy(s, RangeJoinStrategy)
    s
  }

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("strategy fires: range-predicate join plans BroadcastRangeJoinExec") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong, (i % 55).toDouble))
      .toDF("id", "qty")
    val bins = Seq((0, 10), (10, 25), (25, 51)).toDF("lo", "hi")
    val joined = facts.join(bins,
      col("qty") >= col("lo") && col("qty") < col("hi"))
    assert(physicalPlan(joined).contains("BroadcastRangeJoin"))
    assert(!physicalPlan(joined).contains("BroadcastNestedLoopJoin"))
    // result parity with the computed expectation
    val got = joined.groupBy("lo").agg(count(lit(1)).as("c"))
      .orderBy("lo").collect().map(r => (r.getInt(0), r.getLong(1)))
    val expect = (1 to 1000).map(i => (i % 55).toDouble)
      .filter(_ < 51).groupBy(q => if (q < 10) 0 else if (q < 25) 10 else 25)
      .view.mapValues(_.size.toLong).toMap
    assert(got.toMap == expect)
  }

  test("left outer + binary IPs + extra conjunct, vs naive BNLJ result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // overlapping ranges on purpose: multi-match correctness
    val ranges = (0 until 500).map { i =>
      val lo = IpMath.parseIp(s"10.0.${i % 40}.${rnd.nextInt(200)}")
      (lo, IpMath.ipAdd(lo, 1 + rnd.nextInt(300)), s"p$i", i % 2)
    }.toDF("lo", "hi", "tag", "parity")
    val probes = (1 to 3000).map { i =>
      (i.toLong, IpMath.parseIp(s"10.0.${rnd.nextInt(45)}.${rnd.nextInt(256)}"))
    }.toDF("id", "ip")

    val cond = col("ip") >= col("lo") && col("ip") <= col("hi") &&
      col("parity") === 1
    val fast = probes.join(ranges, cond, "left")
    assert(physicalPlan(fast).contains("BroadcastRangeJoin"))
    val fastRows = fast.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // baseline: driver-side nested loop over the same data
    val rangeRows = ranges.collect().map(r => (r.getAs[Array[Byte]](0),
      r.getAs[Array[Byte]](1), r.getString(2), r.getInt(3)))
    val probeRows = probes.collect().map(r => (r.getLong(0),
      r.getAs[Array[Byte]](1)))
    val naiveRows = probeRows.flatMap { case (id, ip) =>
      val matches = rangeRows.filter { case (lo, hi, _, parity) =>
        IpMath.compare(ip, lo) >= 0 && IpMath.compare(ip, hi) <= 0 &&
          parity == 1
      }
      if (matches.isEmpty) Seq((id, null: String))
      else matches.toSeq.map(m => (id, m._3))
    }.sorted.toSeq
    assert(fastRows == naiveRows)
    assert(fastRows.exists(_._2 == null)) // some misses survive as outer rows
  }

  test("strategy leaves equi joins and non-broadcastable shapes alone") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "y")).toDF("k", "w")
    val eq = a.join(b, "k")
    assert(!physicalPlan(eq).contains("BroadcastRangeJoin"))
  }

  test("merge hint on the ranges side plans ShuffleRangeJoinExec " +
      "with the broadcast path's exact result") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong, (i % 55).toDouble))
      .toDF("id", "qty")
    val bins = Seq((0, 10), (10, 25), (25, 51)).toDF("lo", "hi")
    val cond = col("qty") >= col("lo") && col("qty") < col("hi")
    val shuffled = facts.join(bins.hint("merge"), cond)
    assert(physicalPlan(shuffled).contains("ShuffleRangeJoin"),
      physicalPlan(shuffled))
    val got = shuffled.groupBy("lo").agg(count(lit(1)).as("c"))
      .orderBy("lo").collect().map(r => (r.getInt(0), r.getLong(1)))
    val viaBroadcast = facts.join(bins, cond)
      .groupBy("lo").agg(count(lit(1)).as("c"))
      .orderBy("lo").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == viaBroadcast.toSeq)
  }

  test("shuffle path: left outer + overlapping binary ranges + " +
      "extra conjunct + null probes matches the broadcast path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val ranges = (0 until 400).map { i =>
      val lo = IpMath.parseIp(s"10.0.${i % 30}.${rnd.nextInt(200)}")
      (lo, IpMath.ipAdd(lo, 1 + rnd.nextInt(400)), s"p$i", i % 2)
    }.toDF("lo", "hi", "tag", "parity")
    val probes = (1 to 2000).map { i =>
      val ip = if (i % 97 == 0) null
        else IpMath.parseIp(s"10.0.${rnd.nextInt(35)}.${rnd.nextInt(256)}")
      (i.toLong, ip)
    }.toDF("id", "ip")
    val cond = col("ip") >= col("lo") && col("ip") <= col("hi") &&
      col("parity") === 1
    val viaShuffle = probes.join(ranges.hint("merge"), cond, "left")
    assert(physicalPlan(viaShuffle).contains("ShuffleRangeJoin"))
    val a = viaShuffle.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val viaBroadcast = probes.join(ranges, cond, "left")
    assert(physicalPlan(viaBroadcast).contains("BroadcastRangeJoin"))
    val b = viaBroadcast.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b)
    assert(a.exists(_._2 == null)) // outer misses (incl. null probes) kept
  }

  test("over-threshold ranges with no equi conjunct auto-escalate " +
      "to the shuffle path instead of a BNLJ") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val facts = (1 to 200).map(i => (i.toLong, (i % 55).toDouble))
        .toDF("id", "qty")
      val bins = Seq((0, 10), (10, 25), (25, 51)).toDF("lo", "hi")
      val joined = facts.join(bins,
        col("qty") >= col("lo") && col("qty") < col("hi"))
      val p = physicalPlan(joined)
      assert(p.contains("ShuffleRangeJoin"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
