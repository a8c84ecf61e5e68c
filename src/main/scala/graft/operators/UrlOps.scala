package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL structure operators for crawl curation: host / port / path /
  * query decomposition, registrable-domain (eTLD+1) extraction, and
  * the per-domain cap — the domain-diversity sampler every web-corpus
  * pipeline runs after dedup (caps over-represented hosts so a
  * handful of domains can't dominate the training mixture).
  *
  * All column functions are compositions of codegen'd built-ins
  * (`regexp_extract`, `split`, `slice`, `array_join`) — no UDFs, so
  * they stay inside whole-stage codegen and are usable in pushed-down
  * projections over the WARC source's `target_uri`.
  *
  * eTLD+1 here uses a compiled-in multi-part-suffix list (the
  * high-traffic entries of the Public Suffix List). The real PSL is
  * ~10k rules and updates monthly; at production scale it loads as a
  * broadcast set with the same last-2/last-3 label logic — the
  * algorithm below is unchanged, only the set swaps (documented
  * stand-in, same stance as the codec stubs).
  */
object UrlOps {

  /** Multi-part public suffixes recognized by [[etld1]]. */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr", "com.ar", "github.io")

  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  /** Hostname of an absolute URL (scheme required; userinfo and port
    * stripped). Empty-no-match becomes NULL.
    */
  def host(url: Column): Column =
    nullif(regexp_extract(url, SchemeHost, 1), lit(""))

  /** Explicit port, NULL when absent. */
  def port(url: Column): Column =
    nullif(regexp_extract(url, SchemeHost + ":([0-9]+)", 2), lit(""))
      .cast("int")

  /** Number of non-empty path segments (0 for no / root path). */
  def pathDepth(url: Column): Column = {
    val path = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    size(filter(split(path, "/"), seg => seg =!= ""))
  }

  /** Number of &-separated query parameters (0 when no query). */
  def queryParamCount(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    when(q === "", 0).otherwise(size(split(q, "&")))
  }

  /** Registrable domain: last two host labels, or last three when the
    * last two form a multi-part suffix (`a.b.co.uk` → `b.co.uk`).
    * Hosts with ≤2 labels (incl. bare IPv4) pass through unchanged.
    */
  def etld1(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(hostCol.isNull, lit(null))
      .when(size(labels) <= 2, hostCol)
      .when(array_contains(typedLit(MultiPartSuffixes), last2), last3)
      .otherwise(last2)
  }

  /** Keeps at most `k` rows per domain, chosen by ascending
    * `orderKey` (pass a hash for an unbiased deterministic sample) —
    * the exact cap. One shuffle on `domain`; per-task input is one
    * domain's rows, so a monster domain (10⁸ captures of one host at
    * 100 TB) needs the pre-trim: `preTrimFactor` > 0 first drops rows
    * whose per-(domain, hash-shard) rank exceeds `k` — computed over
    * `preTrimFactor` shards with a narrow window each, bounding any
    * single task to ~rows/shards of the hot domain while provably
    * keeping every row the exact cap would keep (the global top-k by
    * orderKey is a subset of the union of per-shard top-k).
    */
  def domainCap(
      df: DataFrame,
      domain: Column,
      orderKey: Column,
      k: Int,
      preTrimFactor: Int = 0): DataFrame = {
    val base =
      if (preTrimFactor <= 0) df
      else {
        val shard = pmod(xxhash64(orderKey), lit(preTrimFactor))
        val ws = Window.partitionBy(domain, shard).orderBy(orderKey)
        df.withColumn("__srn", row_number().over(ws))
          .filter(col("__srn") <= k).drop("__srn")
      }
    val w = Window.partitionBy(domain).orderBy(orderKey)
    base.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
