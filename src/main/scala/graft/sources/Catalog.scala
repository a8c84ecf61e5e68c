package graft.sources

import java.sql.Date
import java.util.zip.ZipFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset catalog concerns (SURVEY §2.1 S1/S2, §2.3 F1–F3, §2.7 O6):
  * file-listing filters with regex + date pruning applied *before*
  * any bytes are read (the reference prunes at GCS listing time), zip
  * member extraction, and incremental refresh (only new paths load).
  */
object Catalog {

  /** Acceptable-dataset regexes (geoloader.go:37-41,
    * geoloader-asn.go:24-25; RouteViews pinned to the 1st of the
    * month to conserve RAM).
    */
  val GeoLite2Regex =
    """Maxmind/\d{4}/\d{2}/\d{2}/\d{8}T\d{6}Z-GeoLite2-City-CSV\.zip""".r
  val GeoLegacyRegex = """.*-GeoLiteCity\.dat.*""".r
  val GeoLegacyV6Regex = """.*-GeoLiteCityv6\.dat.*""".r
  val AsnV4Regex =
    """RouteViewIPv4/\d{4}/\d{2}/routeviews-(oix|rv2)-\d{6}01-\d{4}\.pfx2as\.gz""".r
  val AsnV6Regex =
    """RouteViewIPv6/\d{4}/\d{2}/routeviews-rv6-\d{6}01-\d{4}\.pfx2as\.gz""".r

  /** F2: legacy datasets serve dates before this; GeoLite2 after
    * (geoloader.go:34 — 2017-08-15).
    */
  val GeoLite2StartDate: Date = Date.valueOf("2017-08-15")

  /** F3: RouteViews files older than these are skipped
    * (geoloader-asn.go:27-28).
    */
  val AsnV4StartDate: Date = Date.valueOf("2009-02-01")
  val AsnV6StartDate: Date = Date.valueOf("2018-06-01")

  /** S1 LISTING as a metadata-only Spark scan: `binaryFile` with a
    * path glob + recursive lookup over a snapshot tree
    * (`Maxmind/yyyy/mm/dd/<stamp>-<dataset>.zip`,
    * geoloader.go:92-156). The glob prunes at the FILE INDEX — an
    * excluded file never enters the scan's input-file list, so no
    * read task is ever planned for it — and selecting only
    * path/length/modificationTime prunes the `content` column, so
    * the listing phase reads directory metadata, not file bytes
    * (the reference's GCS listing). Feed the result through
    * [[acceptPaths]] for the regex + date-cutoff filters.
    */
  def listTree(spark: SparkSession, root: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("length"), col("modificationTime"))

  /** S1/F1/F3 as a DataFrame transform over a listing of paths:
    * regex-keep + path-derived date cutoff, so excluded files are
    * pruned before any read is planned.
    */
  def acceptPaths(listing: DataFrame, regex: String,
      dateExtract: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      notBefore: Option[Date] = None, notAfter: Option[Date] = None,
      pathCol: String = "path"): DataFrame = {
    val base = listing
      .filter(col(pathCol).rlike(regex))
      .withColumn("snapshot_date", dateExtract(col(pathCol)))
      .filter(col("snapshot_date").isNotNull)
    val lo = notBefore.map(d => col("snapshot_date") >= lit(d)).getOrElse(lit(true))
    val hi = notAfter.map(d => col("snapshot_date") <= lit(d)).getOrElse(lit(true))
    base.filter(lo && hi)
  }

  /** O6 incremental refresh (geoloader.go:122-127): of an accepted
    * listing, keep only paths not already loaded — an anti-join on
    * path, so a 24 h refresh re-parses nothing it already has.
    */
  def newPaths(accepted: DataFrame, loaded: DataFrame,
      pathCol: String = "path"): DataFrame =
    accepted.join(loaded.select(col(pathCol)).distinct(),
      Seq(pathCol), "left_anti")

  /** S2 zip member scan (loader.go:29-75): extract named members
    * (substring match, like FindFile) to temp files on the driver;
    * the returned paths feed `spark.read.csv`. Zip isn't a
    * splittable stream format — member extraction is inherently a
    * driver/ingest step, then Spark parallelizes over the extracted
    * files.
    */
  def extractZipMembers(zipPath: String, memberSubstrings: Seq[String])
      : Map[String, String] = {
    val zf = new ZipFile(zipPath)
    try {
      val entries = scala.jdk.CollectionConverters
        .EnumerationHasAsScala(zf.entries()).asScala.toList
      memberSubstrings.flatMap { sub =>
        entries.find(_.getName.contains(sub)).map { e =>
          val out = java.nio.file.Files.createTempFile("zipmember",
            s"-${new java.io.File(e.getName).getName}")
          out.toFile.deleteOnExit() // caller may delete earlier
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          sub -> out.toString
        }
      }.toMap
    } finally zf.close()
  }
}
