package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Declared queries for the xxhash64-based sketch operators and the
  * multimodal plumbing. These are deterministic but not expressible
  * in DuckDB SQL (different hash functions / media ops), so they are
  * declared WITHOUT oracle SQL — the driver records the weaker
  * rows-only check; full behavior is covered by ExtensionSpec.
  */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SimHash sketches per document (64-bit, deterministic).
    "q40_simhash" -> ((s, d) =>
      Dedup.simhash64(
          Tables.documents(s, d).filter(col("doc_id") < 100),
          "text", "doc_id")
        .orderBy("doc_id")),

    // Winnowing fingerprint sketch sizes.
    "q41_fingerprints" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          size(TextAnalysis.fingerprints(col("text"))).as("n_fp"))
        .orderBy("doc_id")),

    // Heuristic language-ID distribution over the corpus.
    "q42_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(TextAnalysis.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("c"))
        .orderBy("lang_pred")),

    // MinHash+LSH near-duplicate candidate pairs.
    "q43_neardup_pairs" -> ((s, d) =>
      Dedup.nearDupPairs(
          Tables.documents(s, d).filter(col("doc_id") < 200),
          "text", "doc_id", numHashes = 32, bands = 8, threshold = 0.4)
        .orderBy("a", "b")),

    // LSH-bucketed ANN: nearest neighbor for the first five vectors.
    "q44_lsh_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"),
          col("embedding").as("probe_vec"))
      Similarity.lshTopK(emb, probes, 3, Similarity.hyperplanes(64, 8))
        .orderBy("probe_id", "rank")
    }),

    // Multimodal plumbing driven through the contract: documents'
    // text bytes stand in for opaque media; metadata + stub features.
    "q45_multimodal" -> ((s, d) => {
      val media = Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("media"))
      val withMeta = Multimodal.withMeta(media)
      Multimodal.extractFeatures(withMeta)
        .select(col("media_id"), size(col("features")).as("dim"),
          round(aggregate(col("features"), lit(0.0d),
            (acc, v) => acc + v.cast("double")), 2).as("mass"))
        .orderBy("media_id")
    })
  )
}
