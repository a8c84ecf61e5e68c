package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** asOfNearest (AsOf.scala): closest snapshot in either direction,
  * tie -> backward (earlier). Edge semantics pinned here; the
  * oracle-checked q120 pins the bulk behavior.
  */
class AsOfNearestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val snaps = Seq(
    ("a", 10L, "s10"), ("a", 20L, "s20"),
    ("b", 100L, "s100")).toDF("k", "st", "tag")

  private def run(facts: Seq[(Int, String, Long)]) =
    AsOf.asOfNearest(facts.toDF("id", "k", "ft"), snaps,
        col("ft"), "st", Seq("k"), "id")
      .select("id", "st", "tag", "asof_dir")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getString(3))).toSeq.sortBy(_._1)

  test("backward closer, forward closer, exact hit, tie -> backward") {
    val out = run(Seq(
      (1, "a", 12L),  // back 10 (d2) vs fwd 20 (d8) -> back
      (2, "a", 19L),  // back 10 (d9) vs fwd 20 (d1) -> fwd
      (3, "a", 20L),  // exact: both candidates are 20 -> 'b'
      (4, "a", 15L))) // equidistant 10/20 -> backward
    assert(out == Seq(
      (1, 10L, "s10", "b"), (2, 20L, "s20", "f"),
      (3, 20L, "s20", "b"), (4, 10L, "s10", "b")))
  }

  test("facts outside the snapshot span clamp to the nearer end") {
    val out = run(Seq(
      (1, "a", 5L),    // before all -> forward to 10
      (2, "a", 999L))) // after all -> backward to 20
    assert(out == Seq((1, 10L, "s10", "f"), (2, 20L, "s20", "b")))
  }

  test("key with no snapshots keeps the fact with NULL payload/dir") {
    val out = AsOf.asOfNearest(
        Seq((1, "zz", 50L)).toDF("id", "k", "ft"), snaps,
        col("ft"), "st", Seq("k"), "id")
      .select("id", "st", "tag", "asof_dir").collect()
    assert(out.length == 1 && out(0).getInt(0) == 1 &&
      out(0).isNullAt(1) && out(0).isNullAt(2) && out(0).isNullAt(3))
  }

  test("guarded path (hot key, tiny maxKeyRows) matches the unguarded result") {
    // one key with a long timeline on both sides: maxKeyRows=8
    // forces the time-slice guard inside BOTH directional merges;
    // the composition must be invisible in the result
    val snaps = (0 until 200).map(i => ("hot", i * 10L, s"s$i")).toDF("k", "st", "tag")
    val facts = (0 until 300).map(i => (i, "hot", i * 7L + 3L)).toDF("id", "k", "ft")
    def run(maxKeyRows: Int) =
      AsOf.asOfNearest(facts, snaps, col("ft"), "st", Seq("k"), "id",
          maxKeyRows = maxKeyRows)
        .select("id", "st", "tag", "asof_dir")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSeq.sortBy(_._1)
    assert(run(8) == run(1 << 20))
  }

  test("non-numeric time axis is rejected") {
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfNearest(Seq((1, "a", "x")).toDF("id", "k", "ft"),
        Seq(("a", "y", "t")).toDF("k", "st", "tag"),
        col("ft"), "st", Seq("k"), "id")
    }
    assert(e.getMessage.contains("numeric"))
  }
}
