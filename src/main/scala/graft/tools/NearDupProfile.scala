package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Dev tool: stage-by-stage timing of the near-dup pipeline. */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(body: => Long): Unit = {
      body
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$r")
    }
    t("grams") { Dedup.explodeGrams(docs, "text", "doc_id").count() }
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id")
    t("signatures") { sigs.count() }
    val sigsC = sigs.localCheckpoint(true)
    t("lsh_pairs") { Dedup.lshCandidatePairs(sigsC, "doc_id").count() }
    val pairs = Dedup.nearDupPairs(docs, "text", "doc_id")
    t("pairs_full") { pairs.count() }
    val pairsC = pairs.localCheckpoint(true)
    t("cc") { Graph.connectedComponents(pairsC).count() }
    spark.stop()
  }
}
