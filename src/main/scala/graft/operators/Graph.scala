package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * near-dup PAIRS into dedup GROUPS so a pipeline can keep one
  * canonical doc per component.
  *
  * Two physical paths behind one API, mirroring the broadcast-vs-
  * shuffle threshold pattern used elsewhere in this engine:
  *
  *  - edge lists up to `driverEdgeLimit` run a driver union-find
  *    (near-dup candidate lists are pair-scale, not corpus-scale —
  *    a dimension-scale collect, one pass, no iteration jobs);
  *  - larger graphs run iterative min-label propagation: every node
  *    starts labeled with its own id, labels flow across edges each
  *    round, every node keeps the minimum seen; fixpoint when no
  *    label changes. Each round is one shuffle join + one aggregate,
  *    fully distributed; rounds = graph diameter, small for
  *    near-dup graphs (dense cliques, diameter 1–2). For adversarial
  *    long-chain graphs the documented escalation is large-star/
  *    small-star (alternating propagations that halve the diameter
  *    per round) — same per-round Spark shape, fewer rounds.
  */
object Graph {

  /** Component label (= minimum reachable node id) for every node
    * that appears in `edges`. Output columns: (id, cluster).
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b", maxIter: Int = 25,
      driverEdgeLimit: Int = 500000): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // probe and fetch in ONE job: take limit+1 rows — if they all
    // arrived the graph is driver-scale and already in hand; only
    // oversized graphs pay a second (distributed) evaluation
    val head = e.limit(driverEdgeLimit + 1).collect()
    if (head.length <= driverEdgeLimit) driverUnionFind(e, head)
    else labelPropagation(e, maxIter)
  }

  private def driverUnionFind(e: DataFrame,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = mutable.Map.empty[Long, Long]
    // iterative find + path compression: recursion would stack-
    // overflow on chain-shaped graphs (depth can reach the edge
    // count when unions arrive in descending order)
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { row =>
      val (ru, rv) = (find(row.getLong(0)), find(row.getLong(1)))
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    val spark = e.sparkSession
    import spark.implicits._
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "cluster")
  }

  /** `localCheckpoint` after each round cuts the lineage — without
    * it, every round re-derives the whole join history of the
    * previous rounds and the plan doubles per iteration.
    */
  private def labelPropagation(e: DataFrame, maxIter: Int): DataFrame = {
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var labels = und.select(col("u").as("id")).distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = und.join(labels, und("u") === labels("id"))
        .select(und("v").as("id"), labels("lab"))
      // checkpointed BEFORE the self-join below — cuts lineage and
      // sidesteps self-joining a union plan
      val hop = labels.select("id", "lab").union(prop)
        .groupBy("id").agg(min("lab").as("lab"))
        .localCheckpoint(true)
      // pointer jump: follow each label to ITS label. One-hop
      // propagation alone needs diameter-many rounds (a chain of
      // 10^6 nodes would never converge inside maxIter); the jump
      // halves the remaining depth every round → O(log diameter)
      val hopR = hop.select(col("id").as("__jid"), col("lab").as("__jlab"))
      // checkpointed too: `next` feeds the changed-count job AND
      // three spots in the following round — unmaterialized, the
      // |V|-row jump join would recompute for each
      val next = hop.join(hopR, hop("lab") === hopR("__jid"), "left")
        .select(hop("id"), coalesce(col("__jlab"), hop("lab")).as("lab"))
        .localCheckpoint(true)
      changed = next.alias("n")
        .join(labels.select(col("id"), col("lab").as("old")), "id")
        .filter(col("lab") =!= col("old")).count()
      labels = next
      i += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lab").as("cluster"))
  }
}
