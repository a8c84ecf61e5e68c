package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.IpMath

/** Golden tests transcribed from the reference's iputils_test.go
  * (TestBuildIPNodeList:18-42, WithMerge:44-67,
  * TestHandleStackNoIntersection:161-183, NestedNetworks:185-224,
  * Intersection:226-253) plus invariants the lookup depends on.
  */
class RangesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cidrRows(rows: (String, String)*): Seq[(String, Array[Byte], Array[Byte], String)] =
    rows.map { case (cidr, pay) =>
      val r = IpMath.cidrToRange(cidr)
      ("d1", r._1, r._2, pay)
    }

  private def ipRows(rows: (String, String, String)*): Seq[(String, Array[Byte], Array[Byte], String)] =
    rows.map { case (lo, hi, pay) =>
      ("d1", IpMath.parseIp(lo), IpMath.parseIp(hi), pay)
    }

  private def run(input: Seq[(String, Array[Byte], Array[Byte], String)]): Seq[(String, String, String)] = {
    import spark.implicits._
    val df = input.toDF("dataset", "lo", "hi", "payload")
    Ranges.flattenRanges(df, Seq("dataset")).collect()
      .map(r => (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")),
        r.getAs[String]("payload")))
      .sortBy(t => IpMath.parseIp(t._1).map(b => f"${b & 0xff}%02x").mkString)
      .toSeq
  }

  test("BuildIPNodeList golden: nested CIDRs punch holes, parents resume") {
    val got = run(cidrRows(
      "1.0.0.0/24" -> "custom1",
      "1.0.0.2/26" -> "custom2",
      "1.0.10.0/24" -> "custom3",
      "1.0.10.124/30" -> "custom4",
      "2.1.0.0/8" -> "custom5"))
    assert(got == Seq(
      ("1.0.0.0", "1.0.0.1", "custom1"),
      ("1.0.0.2", "1.0.0.63", "custom2"),
      ("1.0.0.64", "1.0.0.255", "custom1"),
      ("1.0.10.0", "1.0.10.123", "custom3"),
      ("1.0.10.124", "1.0.10.127", "custom4"),
      ("1.0.10.128", "1.0.10.255", "custom3"),
      ("2.1.0.0", "2.255.255.255", "custom5")))
  }

  test("BuildIPNodeListWithMerge golden: equal-payload child absorbed") {
    val got = run(cidrRows(
      "1.0.0.0/24" -> "custom1",
      "1.0.0.2/26" -> "custom1",
      "1.0.10.0/24" -> "custom3",
      "1.0.10.124/30" -> "custom4",
      "2.1.0.0/8" -> "custom5"))
    assert(got == Seq(
      ("1.0.0.0", "1.0.0.255", "custom1"),
      ("1.0.10.0", "1.0.10.123", "custom3"),
      ("1.0.10.124", "1.0.10.127", "custom4"),
      ("1.0.10.128", "1.0.10.255", "custom3"),
      ("2.1.0.0", "2.255.255.255", "custom5")))
  }

  test("handleStack golden: no intersection passes through") {
    val got = run(ipRows(
      ("1.0.0.0", "1.0.1.0", "a"),
      ("1.0.1.1", "1.0.1.12", "b"),
      ("1.0.1.100", "1.0.1.112", "c")))
    assert(got == Seq(
      ("1.0.0.0", "1.0.1.0", "a"),
      ("1.0.1.1", "1.0.1.12", "b"),
      ("1.0.1.100", "1.0.1.112", "c")))
  }

  test("handleStack golden: multiple embedded ranges") {
    val got = run(ipRows(
      ("1.0.0.0", "1.0.1.0", "p0"),
      ("1.0.1.1", "1.0.1.100", "p1"),
      ("1.0.1.10", "1.0.1.20", "c1"),
      ("1.0.1.30", "1.0.1.80", "c2"),
      ("1.0.2.1", "1.0.2.112", "p2")))
    assert(got == Seq(
      ("1.0.0.0", "1.0.1.0", "p0"),
      ("1.0.1.1", "1.0.1.9", "p1"),
      ("1.0.1.10", "1.0.1.20", "c1"),
      ("1.0.1.21", "1.0.1.29", "p1"),
      ("1.0.1.30", "1.0.1.80", "c2"),
      ("1.0.1.81", "1.0.1.100", "p1"),
      ("1.0.2.1", "1.0.2.112", "p2")))
  }

  test("handleStack golden: partial intersection (degenerate remnant dropped)") {
    val got = run(ipRows(
      ("1.0.0.0", "1.0.1.0", "x"),
      ("1.0.0.150", "1.0.3.1", "y")))
    assert(got == Seq(
      ("1.0.0.0", "1.0.0.149", "x"),
      ("1.0.0.150", "1.0.3.1", "y")))
  }

  test("groups flatten independently") {
    import spark.implicits._
    val rows = Seq(
      ("g1", IpMath.cidrToRange("1.0.0.0/24")._1, IpMath.cidrToRange("1.0.0.0/24")._2, "a"),
      ("g1", IpMath.cidrToRange("1.0.0.128/25")._1, IpMath.cidrToRange("1.0.0.128/25")._2, "b"),
      ("g2", IpMath.cidrToRange("1.0.0.0/24")._1, IpMath.cidrToRange("1.0.0.0/24")._2, "c"))
    val df = rows.toDF("dataset", "lo", "hi", "payload")
    val got = Ranges.flattenRanges(df, Seq("dataset")).collect()
      .map(r => (r.getString(0), IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")), r.getString(3)))
      .sortBy(t => (t._1, t._2.length, t._2))
    assert(got.toSeq == Seq(
      ("g1", "1.0.0.0", "1.0.0.127", "a"),
      ("g1", "1.0.0.128", "1.0.0.255", "b"),
      ("g2", "1.0.0.0", "1.0.0.255", "c")))
  }

  test("binary group columns compare by value, not reference") {
    import spark.implicits._
    val r1 = IpMath.cidrToRange("1.0.0.0/24")
    val r2 = IpMath.cidrToRange("1.0.0.128/25")
    // group key is itself a byte array; both rows must land in ONE
    // group so the child punches a hole in the parent
    val gk = IpMath.parseIp("9.9.9.9")
    val df = Seq((gk, r1._1, r1._2, "a"), (gk.clone(), r2._1, r2._2, "b"))
      .toDF("gbin", "lo", "hi", "payload")
    val got = Ranges.flattenRanges(df, Seq("gbin")).collect()
      .map(r => (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")), r.getString(3)))
      .sortBy(t => IpMath.parseIp(t._1).map(b => f"${b & 0xff}%02x").mkString)
    assert(got.toSeq == Seq(
      ("1.0.0.0", "1.0.0.127", "a"),
      ("1.0.0.128", "1.0.0.255", "b")))
  }

  test("merge absorb keeps output disjoint past the open child") {
    // P=A, then two same-payload siblings C1+C2 inside it: C2 merges
    // into C1's emitted node; the parent must resume AFTER the merged
    // end (the Go reference resumes at C1's original end and emits
    // overlap)
    val got = run(ipRows(
      ("10.0.0.0", "10.0.0.255", "A"),
      ("10.0.0.16", "10.0.0.31", "B"),
      ("10.0.0.32", "10.0.0.47", "B")))
    assert(got == Seq(
      ("10.0.0.0", "10.0.0.15", "A"),
      ("10.0.0.16", "10.0.0.47", "B"),
      ("10.0.0.48", "10.0.0.255", "A")))
  }

  test("range starting exactly at the ancestor's end stays nested") {
    // nn.lo == P.hi: the ancestor still covers nn.lo, so its tail is
    // [.32,.254] and the /32 keeps its own payload (strict-lt port of
    // the Go closing condition emitted [.32,.255] overlapping nn)
    val got = run(ipRows(
      ("10.0.0.0", "10.0.0.255", "A"),
      ("10.0.0.16", "10.0.0.31", "B"),
      ("10.0.0.255", "10.0.0.255", "C")))
    assert(got == Seq(
      ("10.0.0.0", "10.0.0.15", "A"),
      ("10.0.0.16", "10.0.0.31", "B"),
      ("10.0.0.32", "10.0.0.254", "A"),
      ("10.0.0.255", "10.0.0.255", "C")))
  }

  test("mergeAdjacent collapses chained overlaps via running max-hi") {
    import spark.implicits._
    val df = ipRows(
      ("10.0.0.0", "10.0.0.100", "a"),
      ("10.0.0.10", "10.0.0.20", "a"),
      ("10.0.0.50", "10.0.0.60", "a"))
      .toDF("dataset", "lo", "hi", "payload")
    val got = Ranges.mergeAdjacent(df, Seq("dataset")).collect()
      .map(r => (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")), r.getString(3)))
    assert(got.toSeq == Seq(("10.0.0.0", "10.0.0.100", "a")))
  }

  test("invariant: output is sorted and disjoint for random nested CIDRs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cidrs = (1 to 300).map { _ =>
      val base = rnd.nextInt(1 << 16).toLong << 16
      val len = 8 + rnd.nextInt(24)
      val masked = if (len == 0) 0L else base & (-1L << (32 - len)) & 0xffffffffL
      val q = Array(24, 16, 8, 0).map(sh => (masked >> sh) & 0xff)
      (s"${q(0)}.${q(1)}.${q(2)}.${q(3)}/$len", s"p${rnd.nextInt(5)}")
    }
    val got = run(cidrRows(cidrs: _*))
    val bins = got.map(t => (IpMath.parseIp(t._1), IpMath.parseIp(t._2)))
    bins.foreach { case (lo, hi) => assert(IpMath.compare(lo, hi) <= 0) }
    bins.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(IpMath.compare(hi1, lo2) < 0, "overlap between consecutive ranges")
      case _ =>
    }
  }

  test("zero-address child: parent remnant dropped, no wrap to max key") {
    // child shares lo = :: with its parent; truncating the parent at
    // nn.lo-1 would wrap to ff…ff and emit an overlapping remnant
    // whose hi is the maximum key (the reference inherits this wrap)
    val got = run(ipRows(
      ("::", "::ff", "parent"),
      ("::", "::0f", "child")))
    assert(got == Seq(
      ("::", "::f", "child"),
      ("::10", "::ff", "parent")))
    // and via the absorb rule: equal payload at the zero address merges
    val merged = run(ipRows(
      ("::", "::5", "p"),
      ("::", "::a", "p")))
    assert(merged == Seq(("::", "::a", "p")))
  }

  test("mergeAdjacent: overlap at the zero address merges (no wrap)") {
    import spark.implicits._
    val df = ipRows(
      ("::", "::5", "p"),
      ("::", "::a", "p"),
      ("::b", "::f", "p"))
      .toDF("dataset", "lo", "hi", "payload")
    val got = Ranges.mergeAdjacent(df, Seq("dataset")).collect()
      .map(r => (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")), r.getString(3)))
    assert(got.toSeq == Seq(("::", "::f", "p")))
  }

  test("mergeAdjacent window pipeline: abutting equal payloads collapse") {
    import spark.implicits._
    val df = ipRows(
      ("1.0.0.0", "1.0.0.9", "a"),
      ("1.0.0.10", "1.0.0.19", "a"),
      ("1.0.0.20", "1.0.0.29", "b"),
      ("1.0.0.40", "1.0.0.49", "b"), // gap → no merge
      ("1.0.0.50", "1.0.0.59", "b"))
      .toDF("dataset", "lo", "hi", "payload")
    val got = Ranges.mergeAdjacent(df, Seq("dataset")).collect()
      .map(r => (IpMath.formatIp(r.getAs[Array[Byte]]("lo")),
        IpMath.formatIp(r.getAs[Array[Byte]]("hi")), r.getString(3)))
      .sortBy(_._1.split("\\.").map(_.toInt).toSeq.toString)
    assert(got.toSeq.sortBy(t => IpMath.parseIp(t._1).map(b => f"${b & 0xff}%02x").mkString) == Seq(
      ("1.0.0.0", "1.0.0.19", "a"),
      ("1.0.0.20", "1.0.0.29", "b"),
      ("1.0.0.40", "1.0.0.59", "b")))
  }

  test("flatten_ranges and merge_adjacent are SQL table functions") {
    import spark.implicits._
    graft.Graft.install(spark)
    cidrRows(
      "1.0.0.0/24" -> "custom1",
      "1.0.0.2/26" -> "custom2")
      .toDF("dataset", "lo", "hi", "payload")
      .createOrReplaceTempView("sql_blocks")
    // pure-SQL drive of the A1 flatten operator, composed with the
    // registered scalar ip_format like any other FROM source
    val flat = spark.sql(
      """SELECT ip_format(lo) AS lo, ip_format(hi) AS hi, payload
        |FROM flatten_ranges('sql_blocks', 'dataset') ORDER BY lo""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(flat.toSeq == Seq(
      ("1.0.0.0", "1.0.0.1", "custom1"),
      ("1.0.0.2", "1.0.0.63", "custom2"),
      ("1.0.0.64", "1.0.0.255", "custom1")))
    ipRows(
      ("1.0.0.0", "1.0.0.9", "a"),
      ("1.0.0.10", "1.0.0.19", "a"),
      ("1.0.0.30", "1.0.0.39", "b"))
      .toDF("dataset", "lo", "hi", "payload")
      .createOrReplaceTempView("sql_ranges")
    val merged = spark.sql(
      """SELECT ip_format(lo) AS lo, ip_format(hi) AS hi, payload
        |FROM merge_adjacent('sql_ranges', 'dataset') ORDER BY lo""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(merged.toSeq == Seq(
      ("1.0.0.0", "1.0.0.19", "a"),
      ("1.0.0.30", "1.0.0.39", "b")))
    // default column names + no group columns: two-arg and one-arg
    // call shapes resolve too
    assert(spark.sql("SELECT count(*) AS c FROM merge_adjacent('sql_ranges')")
      .collect()(0).getLong(0) == 2L)
  }
}
