package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Drives the IP Catalyst expressions through real DataFrame plans
  * (whole-stage codegen on) and through SQL registration.
  */
class IpExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import IpFunctions._

  test("ip_to_bin / ip_format round trip in a plan") {
    import spark.implicits._
    val df = Seq("1.2.3.4", "2001:db8::1", "bogus", "")
      .toDF("ip")
      .withColumn("bin", ip_to_bin(col("ip")))
      .withColumn("back", ip_format(col("bin")))
      .withColumn("fam", ip_family(col("bin")))
    val rows = df.collect()
    assert(rows(0).getAs[String]("back") == "1.2.3.4")
    assert(rows(0).getAs[Int]("fam") == 4)
    assert(rows(1).getAs[String]("back") == "2001:db8::1")
    assert(rows(1).getAs[Int]("fam") == 6)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    assert(rows(3).isNullAt(1))
  }

  test("cidr bounds + range_to_cidr + ip_add compose") {
    import spark.implicits._
    val df = Seq("1.0.0.0/24", "2001:db8::/32", "junk")
      .toDF("cidr")
      .select(col("cidr"),
        ip_format(cidr_lo(col("cidr"))).as("lo"),
        ip_format(cidr_hi(col("cidr"))).as("hi"),
        range_to_cidr(cidr_lo(col("cidr")), cidr_hi(col("cidr"))).as("rt"),
        ip_format(ip_plus_one(cidr_hi(col("cidr")))).as("next"))
    val rows = df.collect()
    assert(rows(0).getAs[String]("lo") == "1.0.0.0")
    assert(rows(0).getAs[String]("hi") == "1.0.0.255")
    assert(rows(0).getAs[String]("rt") == "1.0.0.0/24")
    assert(rows(0).getAs[String]("next") == "1.0.1.0")
    assert(rows(1).getAs[String]("rt") == "2001:db8::/32")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
  }

  test("binary IP ordering matches unsigned semantics in a range predicate") {
    import spark.implicits._
    val probe = ip_to_bin(lit("1.0.0.50"))
    val df = Seq(("1.0.0.0/26", "a"), ("1.0.0.64/26", "b"))
      .toDF("cidr", "tag")
      .filter(probe >= cidr_lo(col("cidr")) && probe <= cidr_hi(col("cidr")))
    assert(df.select("tag").as[String].collect().toSeq == Seq("a"))
  }

  test("ip_mask_cidr and rewrite6to4 match reference behavior") {
    import spark.implicits._
    val df = Seq("192.168.1.77", "2001:db8:1:2:3:4:5:6")
      .toDF("ip")
      .select(ip_mask_cidr(ip_to_bin(col("ip"))).as("cidr"))
    assert(df.as[String].collect().toSeq ==
      Seq("192.168.1.64/26", "2001:db8:1:2::/64"))

    val r = Seq("2002:101:202::", "9.9.9.9").toDF("ip")
      .select(rewrite6to4(col("ip")).as("out")).as[String].collect()
    assert(r.toSeq == Seq("1.1.2.2", "9.9.9.9"))
  }

  test("functions are SQL-registered") {
    IpFunctions.register(spark)
    val row = spark.sql(
      """SELECT ip_format(ip_to_bin('10.0.0.1')) AS a,
        |       range_to_cidr(cidr_lo('10.0.0.0/8'), cidr_hi('10.0.0.0/8')) AS b,
        |       ip_family(ip_to_bin('::1')) AS c,
        |       ip_mask_cidr(ip_to_bin('1.2.3.4'), 26, 64) AS d,
        |       ip6to4('2002:505:606::') AS e
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "10.0.0.1")
    assert(row.getString(1) == "10.0.0.0/8")
    assert(row.getInt(2) == 6)
    assert(row.getString(3) == "1.2.3.0/26")
    assert(row.getString(4) == "5.5.6.6")
  }
}
