package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions._

/** F6 server-vs-client split + J10 response merge
  * (api-v2.go:277-293, 376-383): request IPs that match the siteinfo
  * network dimension are answered locally; the rest go to the remote
  * annotator; local answers win on merge.
  */
object Split {

  /** Split facts into (server-matched, rest): a semi/anti join pair
    * against the masked-CIDR site dimension.
    */
  def splitServerIps(facts: DataFrame, sites: DataFrame,
      ipStr: Column): (DataFrame, DataFrame) = {
    val keyed = facts.withColumn("__site_cidr",
      ip_mask_cidr(ip_to_bin(rewrite6to4(ipStr))))
    // canonicalized key — see Annotate.annotateSite: format-normalize
    // while preserving the entry's own prefix length (a non-/26//64
    // site must not match, as in the reference)
    val siteKeys = broadcast(
      sites.select(cidr_canonical(col("cidr")).as("__site_cidr"))
        .distinct())
    val server = keyed.join(siteKeys, Seq("__site_cidr"), "left_semi")
      .drop("__site_cidr")
    val client = keyed.join(siteKeys, Seq("__site_cidr"), "left_anti")
      .drop("__site_cidr")
    (server, client)
  }

  /** J10 merge: union both result sets and keep one row per key with
    * source priority (lower wins — server = 0 beats remote = 1),
    * mirroring the server-side overwrite at api-v2.go:376-383.
    */
  def mergeResponses(server: DataFrame, remote: DataFrame,
      keyCol: String = "ip"): DataFrame = {
    val tagged = server.withColumn("__prio", lit(0))
      .unionByName(remote.withColumn("__prio", lit(1)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__prio"))
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }
}
