package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}

/** Dev tool: corpus-scale throughput of the curation operators over
  * the FULL documents table (the declared queries run bounded slices
  * so their oracles stay cheap; this measures the production path).
  * One JSON line per stage: docs/sec on a warm session.
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()

    def stage(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val out = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"$name","docs_per_sec":${n / dt}%.0f,"in_docs":$n,"out_rows":$out,"sec":$dt%.2f}""")
    }

    stage("exact_dedup") {
      Dedup.exactDedupKeepFirst(docs, "text", "doc_id").count()
    }
    stage("neardup_dedup") {
      Dedup.nearDupDedup(docs, "text", "doc_id").count()
    }
    stage("quality_filter") {
      docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5).count()
    }
    stage("pii_redact") {
      docs.select(TextAnalysis.redactPii(col("text"))).count()
    }
    stage("pack_and_split") {
      Packing.packByBudget(
        Dedup.hashSplit(docs, col("doc_id")),
        col("doc_id"), TextAnalysis.tokenCount(col("text")),
        budget = 2048, shards = 32).count()
    }
    stage("stratified_sample") {
      Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.25), 0.1).count()
    }
    stage("unigram_lm") {
      TextAnalysis.unigramLogProbScore(docs, "text", "doc_id").count()
    }
    spark.stop()
  }
}
