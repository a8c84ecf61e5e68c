package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign each document to a
  * fixed-token-budget bin. Bins are computed per hash shard — the
  * running-total window sorts within a shard, never globally, so the
  * operator scales by adding shards instead of funneling the corpus
  * through one sorted partition. Assignment is deterministic (shard
  * and order derive from the id), so a re-run packs identically.
  */
object Packing {

  /** Adds `shard` and `bin`: documents are ordered by id within their
    * hash shard; a doc starts a new bin when the running token total
    * would pass `budget` multiples (bin = floor(tokens-before-this-doc
    * / budget) — simple deterministic packing, not bin-optimal FFD,
    * which would serialize).
    */
  def packByBudget(df: DataFrame, idCol: Column, nTokCol: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, s"budget=$budget shards=$shards")
    val withShard = df.withColumn("shard",
      Sampling.hashBucket(idCol) % shards)
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
    withShard
      .withColumn("__running", sum(nTokCol).over(w))
      .withColumn("bin",
        floor((col("__running") - nTokCol) / lit(budget)))
      .drop("__running")
  }
}
