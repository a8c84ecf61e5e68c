package graft.api

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Request/response surface (SURVEY §2.1 S12, §3.1-3.2): the Spark
  * shape of the v2 batch API — one as-of dataset selection per batch,
  * per-IP annotation keyed by the *original* request string, JSON
  * with omit-empty parity — plus the v1 compat key scheme.
  */
object Api {

  /** One loaded dataset snapshot pair. */
  final case class Snapshot(date: Date, geo: DataFrame, asn: DataFrame)

  /** The annotator directory: date-sorted snapshots with the as-of
    * pick rule of directory.go:230-240 (latest ≤ d, clamp to
    * earliest).
    */
  final case class Directory(snapshots: Seq[Snapshot]) {
    require(snapshots.nonEmpty, "empty directory")
    private val sorted = snapshots.sortBy(_.date.getTime)
    def forDate(d: Date): Snapshot = {
      val earlier = sorted.takeWhile(!_.date.after(d))
      earlier.lastOption.getOrElse(sorted.head)
    }
    def latest: Snapshot = sorted.last
  }

  /** v2 batch annotate (handler.go:194-243): one snapshot for the
    * whole batch, per-row annotation, Missing defaulting inside
    * [[Annotate.annotate]]. Output: (ip, geo, network).
    */
  def annotateV2(spark: SparkSession, dir: Directory, date: Date,
      ips: DataFrame, ipCol: String = "ip"): DataFrame = {
    val snap = dir.forDate(date)
    Annotate.annotate(spark, ips, col(ipCol), snap.geo, snap.asn)
  }

  /** Render a v2 response document: `{"AnnotatorDate": …,
    * "Annotations": {ip: {Geo…, Network…}}}` (api-v2.go:51-55).
    * to_json drops NULL fields, matching Go's `omitempty`.
    *
    * REQUEST-scale only: this materializes one JSON string on the
    * driver, faithful to the reference's per-HTTP-request response
    * (batches are capped at ~tens of k IPs). Dataset-scale output
    * goes through the parquet/JSON sinks (Verify / writeStream), not
    * through this.
    */
  def toV2ResponseJson(annotated: DataFrame, annotatorDate: Date,
      ipCol: String = "ip"): String = {
    // a batch may legally repeat an IP (the reference's map just
    // overwrites the key); keep one row per key or map_from_arrays
    // throws under the default EXCEPTION dedup policy
    val row = annotated.dropDuplicates(ipCol).agg(
      to_json(struct(
        lit(annotatorDate.toString).as("AnnotatorDate"),
        map_from_arrays(
          collect_list(col(ipCol)),
          collect_list(struct(col("geo").as("Geo"),
            col("network").as("Network")))).as("Annotations")))
        .as("json"))
      .collect()(0)
    row.getString(0)
  }

  /** v1 legacy response key: ip + base-36 unix seconds, lower-case
    * (handler.go:26-30,169-170 — P15).
    */
  def v1Key(ip: Column, ts: Column): Column =
    concat(ip, lower(conv(ts.cast("long").cast("string"), 10, 36)))

  /** v1 batch annotate (handler.go:142-174): every row shares the
    * *first* request's timestamp for dataset selection; response keys
    * are [[v1Key]]; unparseable IPs reject the whole batch
    * (handler.go:446-467 — F5 batch mode).
    */
  def annotateV1(spark: SparkSession, dir: Directory,
      requests: DataFrame, ipCol: String = "ip",
      tsCol: String = "ts"): DataFrame = {
    import graft.functions.IpFunctions.ip_to_bin
    val bad = requests.filter(ip_to_bin(col(ipCol)).isNull).limit(1).count()
    if (bad > 0)
      throw new IllegalArgumentException("invalid IP in v1 batch")
    // the reference uses request[0]'s timestamp for the whole batch;
    // a DataFrame is unordered, so the earliest timestamp is the
    // deterministic analogue of "first"
    val first = requests.agg(min(col(tsCol))).collect()
    require(first.nonEmpty && !first(0).isNullAt(0), "empty v1 batch")
    val batchDate = new Date(first(0).getTimestamp(0).getTime)
    annotateV2(spark, dir, batchDate,
      requests.withColumn("key", v1Key(col(ipCol), col(tsCol))), ipCol)
  }

  /** P18 latency/batch-size bucket label (handler.go:270-283). */
  def batchSizeBucket(n: Column): Column =
    when(n < 5, "<5").when(n < 20, "5+").when(n < 100, "20+")
      .when(n < 400, "100+").otherwise("400+")
}
