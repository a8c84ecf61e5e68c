package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.IpFunctions._

/** Schema-pinned dataset readers with error budgets (SURVEY §2.1
  * S4–S10). No type inference anywhere — every source declares its
  * StructType and reads PERMISSIVE, with corrupt/invalid rows counted
  * against the reference's per-file budgets (csv-reader.go:17-20:
  * ≤ 50 field errors, 0 bad records per file) before the clean rows
  * are returned.
  */
object Ingest {
  /** Budget mirror of loader/csv-reader.go:17-20. */
  final case class ErrorBudget(maxFieldErrors: Int = 50,
      maxBadRecords: Int = 0)

  final class ErrorBudgetExceeded(msg: String) extends RuntimeException(msg)

  val CorruptCol = "_corrupt_record"

  /** Generic budgeted CSV read (S4). `validRecord` flags rows whose
    * *shape* parsed but whose field content fails validation (the
    * reference's Consume-error path); rows DataSource couldn't parse
    * at all land in [[CorruptCol]] (the ValidateRecord path).
    * Budgets apply per source file. Dimension-scale data: one
    * counting pass over the freshly-read file is the contract, not a
    * fact-table scan.
    */
  def readCsvWithBudget(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty,
      budget: ErrorBudget = ErrorBudget())(
      validRecord: DataFrame => Column): DataFrame = {
    val readSchema = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .options(Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol) ++ options)
      .schema(readSchema)
      .csv(path)
      .withColumn("__file", input_file_name())
    val flagged = raw
      .withColumn("__bad", col(CorruptCol).isNotNull)
      .withColumn("__invalid", !col(CorruptCol).isNotNull &&
        !coalesce(validRecord(raw), lit(true)))
      // the cache is required: Spark disallows queries that touch
      // only the corrupt-record column of a raw CSV read, and the
      // budget count below can prune to exactly that
      .cache()
    val counts =
      try flagged
        .groupBy("__file")
        .agg(sum(col("__bad").cast("long")).as("bad"),
          sum(col("__invalid").cast("long")).as("invalid"))
        .collect()
      finally
        // release before returning so repeated loads in a long-lived
        // session don't accumulate cached copies; the caller's first
        // consumption re-reads the (dimension-sized) file instead
        flagged.unpersist(blocking = false)
    counts.foreach { r =>
      val (f, bad, inv) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (bad > budget.maxBadRecords)
        throw new ErrorBudgetExceeded(
          s"$f: $bad bad records > ${budget.maxBadRecords}")
      if (inv > budget.maxFieldErrors)
        throw new ErrorBudgetExceeded(
          s"$f: $inv field errors > ${budget.maxFieldErrors}")
    }
    flagged.filter(!col("__bad") && !col("__invalid"))
      .drop(CorruptCol, "__file", "__bad", "__invalid")
  }

  // ---------------------------------------------------------------
  // S5 GeoLite2 blocks
  // ---------------------------------------------------------------

  /** 10-column blocks schema (geo-ip-ip-loader.go:15). */
  val geoliteBlocksSchema: StructType = StructType(Seq(
    StructField("network", StringType),
    StructField("geoname_id", IntegerType),
    StructField("registered_country_geoname_id", IntegerType),
    StructField("represented_country_geoname_id", IntegerType),
    StructField("is_anonymous_proxy", BooleanType),
    StructField("is_satellite_provider", BooleanType),
    StructField("postal_code", StringType),
    StructField("latitude", StringType),   // empty-tolerant cast below
    StructField("longitude", StringType),
    StructField("accuracy_radius", IntegerType)))

  /** Empty string → 0.0, junk → NULL (field error); mirrors
    * stringToFloat (geo-ip-ip-loader.go:158-168).
    */
  private def emptyTolerantDouble(c: Column): Column =
    when(c.isNull || c === "", lit(0.0)).otherwise(c.try_cast(DoubleType))

  /** GeoLite2 blocks CSV → range rows with binary bounds. Output:
    * (lo, hi, geoname_id, registered_country_geoname_id, postal_code,
    * latitude, longitude).
    */
  def geoliteBlocks(spark: SparkSession, path: String): DataFrame = {
    val df = readCsvWithBudget(spark, path, geoliteBlocksSchema,
      Map("header" -> "true")) { raw =>
      cidr_lo(raw("network")).isNotNull &&
        emptyTolerantDouble(raw("latitude")).isNotNull &&
        emptyTolerantDouble(raw("longitude")).isNotNull
    }
    df.select(
      cidr_lo(col("network")).as("lo"),
      cidr_hi(col("network")).as("hi"),
      col("geoname_id"),
      col("registered_country_geoname_id"),
      col("postal_code"),
      emptyTolerantDouble(col("latitude")).as("latitude"),
      emptyTolerantDouble(col("longitude")).as("longitude"))
  }

  // ---------------------------------------------------------------
  // S6 GeoLite2 locations
  // ---------------------------------------------------------------

  /** 13/14-column locations schema; the 14th (is_in_european_union)
    * appears from 2018/03 (geo-ip-loc-loader.go:74-82). We declare 14
    * and tolerate the shorter form via PERMISSIVE null-fill.
    */
  val geoliteLocationsSchema: StructType = StructType(Seq(
    StructField("geoname_id", IntegerType),
    StructField("locale_code", StringType),
    StructField("continent_code", StringType),
    StructField("continent_name", StringType),
    StructField("country_iso_code", StringType),
    StructField("country_name", StringType),
    StructField("subdivision_1_iso_code", StringType),
    StructField("subdivision_1_name", StringType),
    StructField("subdivision_2_iso_code", StringType),
    StructField("subdivision_2_name", StringType),
    StructField("city_name", StringType),
    StructField("metro_code", StringType), // empty-tolerant cast below
    StructField("time_zone", StringType),
    StructField("is_in_european_union", BooleanType)))

  /** Locations dimension with the reference's validation regexes
    * (geo-ip-loc-loader.go:17-18,105-118): continent/country codes
    * `^[0-9A-Z]*$`, country name `^[^0-9]*$`; empty metro → 0.
    */
  def geoliteLocations(spark: SparkSession, path: String): DataFrame = {
    val caps = "^[0-9A-Z]*$"
    val df = readCsvWithBudget(spark, path, geoliteLocationsSchema,
      Map("header" -> "true")) { raw =>
      coalesce(raw("continent_code"), lit("")).rlike(caps) &&
        coalesce(raw("country_iso_code"), lit("")).rlike(caps) &&
        coalesce(raw("country_name"), lit("")).rlike("^[^0-9]*$") &&
        raw("geoname_id").isNotNull
    }
    df.select(
      col("geoname_id"),
      col("continent_code"),
      col("country_iso_code"),
      col("country_name"),
      col("subdivision_1_iso_code"),
      col("subdivision_1_name"),
      col("subdivision_2_iso_code"),
      col("subdivision_2_name"),
      col("city_name"),
      when(col("metro_code").isNull || col("metro_code") === "", lit(0L))
        .otherwise(col("metro_code").try_cast(LongType)).as("metro_code"))
  }

  // ---------------------------------------------------------------
  // S7 RouteViews pfx2as
  // ---------------------------------------------------------------

  /** Fixed 3-column TSV (asn-loader.go:25,85-89). */
  val pfx2asSchema: StructType = StructType(Seq(
    StructField("prefix", StringType),
    StructField("prefix_len", IntegerType),
    StructField("asn_string", StringType)))

  /** pfx2as TSV → ASN range rows: (lo, hi, asn_string). */
  def pfx2as(spark: SparkSession, path: String): DataFrame = {
    val df = readCsvWithBudget(spark, path, pfx2asSchema,
      Map("sep" -> "\t")) { raw =>
      cidr_lo(concat_ws("/", raw("prefix"), raw("prefix_len"))).isNotNull
    }
    df.select(
      cidr_lo(concat_ws("/", col("prefix"), col("prefix_len"))).as("lo"),
      cidr_hi(concat_ws("/", col("prefix"), col("prefix_len"))).as("hi"),
      col("asn_string"))
  }

  /** P9 ASN-string decode (asn-annotator.go:63-81): `_` splits
    * multi-origin systems, `,` splits AS sets within a system:
    * "55967_38365,64512" → [{asns:[55967]}, {asns:[38365, 64512]}].
    */
  def decodeAsnSystems(c: Column): Column =
    transform(split(c, "_"),
      sys => struct(transform(split(sys, ","),
        a => a.try_cast(LongType)).as("asns")))

  /** P10 best ASN: Systems[0].ASNs[0] (api.go:117-127). */
  def bestAsn(systems: Column): Column =
    element_at(element_at(systems, 1).getField("asns"), 1)

  // ---------------------------------------------------------------
  // S8 AS names / S9 FIPS→ISO (broadcast dimensions)
  // ---------------------------------------------------------------

  val asNamesSchema: StructType = StructType(Seq(
    StructField("asn", StringType), // ipinfo "AS1" form
    StructField("name", StringType),
    StructField("country", StringType),
    StructField("registry", StringType)))

  /** AS-names dimension: (asn LONG, as_name). */
  def asNames(spark: SparkSession, path: String): DataFrame =
    readCsvWithBudget(spark, path, asNamesSchema,
      Map("header" -> "true")) { raw =>
      regexp_extract(raw("asn"), "^AS([0-9]+)$", 1) =!= ""
    }.select(
      regexp_extract(col("asn"), "^AS([0-9]+)$", 1).try_cast(LongType).as("asn"),
      col("name").as("as_name"))

  val fipsSchema: StructType = StructType(Seq(
    StructField("country_iso_code", StringType),
    StructField("region_fips_code", StringType),
    StructField("region_iso_code", StringType),
    StructField("region_name", StringType)))

  /** FIPS→ISO subdivision dimension keyed by `country-fips`
    * (fips.go:26-28,33-60).
    */
  def fipsMap(spark: SparkSession, path: String): DataFrame =
    readCsvWithBudget(spark, path, fipsSchema, Map("header" -> "true"))(
      _ => lit(true))
      .select(
        concat_ws("-", col("country_iso_code"), col("region_fips_code"))
          .as("fips_key"),
        col("region_iso_code"), col("region_name"))

  // ---------------------------------------------------------------
  // S11 legacy GeoIP dataset (tabular form)
  // ---------------------------------------------------------------

  /** GeoIPRecord fields of the legacy dataset (legacy/geoip.go:36-50):
    * explicit range bounds plus the legacy-only payload columns
    * (country_code3, FIPS region, area_code).
    */
  val legacyGeoSchema: StructType = StructType(Seq(
    StructField("ip_lo", StringType),
    StructField("ip_hi", StringType),
    StructField("country_code", StringType),
    StructField("country_code3", StringType),
    StructField("country_name", StringType),
    StructField("region", StringType), // FIPS region code
    StructField("city", StringType),
    StructField("postal_code", StringType),
    StructField("latitude", StringType),  // empty-tolerant cast below
    StructField("longitude", StringType), // empty-tolerant cast below
    StructField("metro_code", LongType),
    StructField("area_code", LongType),
    StructField("continent_code", StringType)))

  /** S11 legacy dataset scan, tabular form: the binary `.dat` unpack
    * itself is out of scope (SURVEY §2.1 — it needs libgeoip; the
    * reference shells out through cgo at legacy/geoip.go:88-134), so
    * this reader takes the unpacked (lo, hi, record) rows and
    * produces the same range table the reference's in-memory dataset
    * holds. Output: (lo BINARY, hi BINARY, payload…).
    */
  def legacyGeo(spark: SparkSession, path: String): DataFrame =
    readCsvWithBudget(spark, path, legacyGeoSchema,
      Map("header" -> "true")) { raw =>
      ip_to_bin(raw("ip_lo")).isNotNull && ip_to_bin(raw("ip_hi")).isNotNull
    }.select(
      ip_to_bin(col("ip_lo")).as("lo") +:
        ip_to_bin(col("ip_hi")).as("hi") +:
        (legacyGeoSchema.fieldNames.drop(2).map {
          case c @ ("latitude" | "longitude") =>
            emptyTolerantDouble(col(c)).as(c)
          case c => col(c)
        }): _*)

  // ---------------------------------------------------------------
  // S10 siteinfo JSON
  // ---------------------------------------------------------------

  private val siteGeoSchema = StructType(Seq(
    StructField("ContinentCode", StringType),
    StructField("CountryCode", StringType),
    StructField("City", StringType),
    StructField("Latitude", DoubleType),
    StructField("Longitude", DoubleType)))

  private val siteNetworkAnnSchema = StructType(Seq(
    StructField("ASNumber", LongType),
    StructField("ASName", StringType),
    StructField("Systems", ArrayType(StructType(Seq(
      StructField("ASNs", ArrayType(LongType))))))))

  val siteinfoSchema: DataType = ArrayType(StructType(Seq(
    StructField("Site", StringType),
    StructField("Network", StructType(Seq(
      StructField("IPv4", StringType),
      StructField("IPv6", StringType)))),
    StructField("Annotation", StructType(Seq(
      StructField("Geo", siteGeoSchema),
      StructField("Network", siteNetworkAnnSchema)))))))

  /** Current ∪ retired site annotations (site.go:150-215): one row
    * per (cidr, family); rows with unparseable CIDRs are dropped
    * (site.go:189-205). The result is a broadcast equi-join dimension
    * keyed on the masked-CIDR string (J6).
    */
  def siteinfo(spark: SparkSession, annotationsPath: String,
      retiredPath: String): DataFrame = {
    def read(path: String): DataFrame =
      spark.read.option("wholetext", "true").text(path)
        .select(from_json(col("value"), siteinfoSchema).as("root"))
        .select(explode(col("root")).as("s"))
    val all = read(annotationsPath).unionByName(read(retiredPath))
    val v4 = all.select(col("s.Network.IPv4").as("cidr"),
      col("s.Site").as("site"), col("s.Annotation").as("annotation"))
    val v6 = all.select(col("s.Network.IPv6").as("cidr"),
      col("s.Site").as("site"), col("s.Annotation").as("annotation"))
    v4.unionByName(v6)
      .filter(col("cidr").isNotNull && col("cidr") =!= "" &&
        cidr_lo(col("cidr")).isNotNull)
  }

  // ---------------------------------------------------------------
  // P8 filename → snapshot date
  // ---------------------------------------------------------------

  /** GeoLite2-style `...20170907T.../...` names (api.go:177-188). */
  def pathDateGeo(c: Column): Column =
    try_to_timestamp(nullif(regexp_extract(c, "([0-9]{8})T", 1), lit("")),
      lit("yyyyMMdd")).cast(DateType)

  /** RouteViews `routeviews-rv2-20190101-1200.pfx2as.gz` names
    * (asn-loader.go:187-214).
    */
  def pathDateAsn(c: Column): Column =
    try_to_timestamp(
      nullif(regexp_extract(c, "(\\d{4})(\\d{2})(\\d{2})-\\d{4}", 0), lit(""))
        .substr(lit(1), lit(8)),
      lit("yyyyMMdd")).cast(DateType)
}
