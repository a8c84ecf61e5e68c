package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * near-dup PAIRS into dedup GROUPS so a pipeline can keep one
  * canonical doc per component.
  *
  * Three physical paths behind one API, mirroring the broadcast-vs-
  * shuffle threshold pattern used elsewhere in this engine:
  *
  *  - edge lists up to `driverEdgeLimit` run a driver union-find
  *    (near-dup candidate lists are pair-scale, not corpus-scale —
  *    a dimension-scale collect, one pass, no iteration jobs);
  *  - larger graphs run large-star/small-star contraction
  *    ([[starContraction]]) — alternating propagations that at least
  *    halve the remaining diameter per alternation, O(log d) rounds
  *    with each round one shuffle-join + aggregate;
  *  - [[labelPropagation]] (min-label flow with pointer jumping)
  *    stays available as the simpler iterative shape; same per-round
  *    cost, more rounds on adversarial chains.
  *
  * The input edge pipeline is materialized ONCE per call (eager
  * `localCheckpoint` before the path probe), so choosing a path never
  * re-runs the upstream pipeline — for LSH pair inputs the minhash /
  * band-join work is the dominant cost and must not be paid twice.
  * Callers that already hold materialized pairs pass them straight in
  * and the checkpoint is a no-op-cheap RDD copy.
  */
object Graph {

  /** Component label (= minimum reachable node id) for every node
    * that appears in `edges`. Output columns: (id, cluster).
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b", maxIter: Int = 25,
      driverEdgeLimit: Int = 500000): DataFrame = {
    // materialize the edge pipeline ONCE: the probe below and (for
    // oversized graphs) every contraction round read these blocks —
    // without the checkpoint the distributed path would re-run the
    // full upstream pipeline (minhash + band join for LSH pairs) on
    // top of the probe's evaluation
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
      .localCheckpoint(true)
    // probe and fetch in ONE job against the checkpointed blocks:
    // take limit+1 rows — if they all arrived the graph is
    // driver-scale and already in hand
    val head = e.limit(driverEdgeLimit + 1).collect()
    if (head.length <= driverEdgeLimit) driverUnionFind(e, head)
    else starContraction(e, maxIter)
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

  /** Large-star/small-star contraction (the alternating-star CC
    * algorithm of Kiveris et al., "Connected Components in MapReduce
    * and Beyond", re-expressed as DataFrame aggregates) plus pointer
    * jumping on the inter-round parent forest:
    *
    *  - large-star: every strictly-larger neighbor of u re-parents to
    *    m = min(N(u) ∪ u) — hangs heavy tails under local minima;
    *  - small-star: each center u and its (now all-smaller) neighbors
    *    re-parent to the center's minimum — flattens short stems;
    *  - two pointer jumps: each edge (u → p) follows p to ITS minimum
    *    parent, twice — valid because a parent is connected to its
    *    parent by construction, so rewiring never crosses components.
    *
    * The star alternation alone halves the remaining depth per round
    * (≈ log₂(diameter) rounds — a 10⁵-node chain would need ~17);
    * each jump halves it again, so a full round contracts ≥ 8× and a
    * 10⁵ chain converges in ~6 rounds. Per-round cost: two aggregates
    * + three |E|-row joins, every shuffle on a dense long key;
    * `localCheckpoint` per round cuts the otherwise-doubling lineage.
    */
  private[operators] def starContraction(e: DataFrame,
      maxRounds: Int): DataFrame = {
    val nodes = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct()
    // parent-pointer edge set, kept directed (u → smaller v) between
    // rounds; self-loops carry no connectivity
    var edges = e.filter(col("u") =!= col("v"))
      .select(col("u"), col("v")).distinct()
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star works on the UNDIRECTED neighborhood — re-dualize
      // each round (the directed parent set alone would starve
      // centers whose edges all point outward). Checkpointed: joining
      // a union plan against an aggregate of itself trips Catalyst's
      // constraint rewrite (AttributeMap key-not-found), and the
      // dualized set feeds both the min aggregate and the probe side
      val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true)
      val mins = und.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = und.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      // small-star over the directed output (every edge now points
      // from larger to smaller): center u re-points itself and its
      // smaller neighbors at its minimum neighbor
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(minsS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(large.join(minsS, "u").select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      // two pointer jumps: follow each parent to its own MIN parent
      // (min keeps the jump table functional — one row per node — so
      // the join cannot multiply edges)
      var jumped = small
      for (_ <- 1 to 2) {
        val j = jumped.groupBy("u").agg(min(col("v")).as("jv"))
          .select(col("u").as("ju"), col("jv"))
        jumped = jumped.alias("s")
          .join(j, col("s.v") === col("ju"), "left")
          .select(col("s.u"), coalesce(col("jv"), col("s.v")).as("v"))
          .filter(col("u") =!= col("v"))
          .distinct()
          .localCheckpoint(true)
      }
      // converged when the round was a fixpoint: the star shape
      // reproduces itself exactly
      val changed = jumped.select(col("u"), col("v"))
        .exceptAll(edges.select(col("u"), col("v"))).limit(1).count()
      converged = changed == 0
      edges = jumped
      round += 1
    }
    require(converged,
      s"starContraction did not converge in $maxRounds rounds")
    // converged star: every remaining edge points at its component
    // minimum; nodes without an out-edge (the minima themselves, and
    // nodes that only ever had self-loops) label themselves
    nodes.join(edges.select(col("u").as("id"), col("v").as("cluster")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** `localCheckpoint` after each round cuts the lineage — without
    * it, every round re-derives the whole join history of the
    * previous rounds and the plan doubles per iteration.
    */
  private[operators] def labelPropagation(e: DataFrame,
      maxIter: Int): DataFrame = {
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

  /** Distributed PageRank (Jacobi, damping 0.85) in exact integer
    * micro-units: every node starts at 1,000,000; along each
    * out-edge it contributes floor(rank*85 / (outdeg*100)); next
    * rank = 150,000 + sum(in-contributions). Floor division keeps
    * every iteration bit-exact across engines (a little mass
    * evaporates — fine for a ranking signal).
    *
    * Contract: every node must have >= 1 in-edge, or it silently
    * drops out of the rank table after one iteration (there is no
    * completing outer join — that is what buys ONE shuffle per
    * iteration). For undirected graphs pass the symmetrized edge
    * list, which guarantees indeg = outdeg >= 1.
    *
    * Shape: out-degree is attached ONCE to the cached (src, dst,
    * outdeg) edge list by a broadcast dim join; each iteration
    * broadcast-joins the node-scale rank table to it and map-side-
    * combines the contribution sum — the edge list never
    * re-shuffles. When the node table outgrows broadcast
    * (billion-node graphs) set `broadcastRanks = false` and the
    * same plan runs as a co-partitioned shuffle join.
    *
    * Iterating deep grows lineage linearly (every rank plan embeds
    * its predecessor), so every `checkpointInterval`-th INTERMEDIATE
    * rank table is eagerly `localCheckpoint`ed — materialized
    * node-scale blocks, lineage cut. The default (5) leaves short
    * oracle-style runs (<= 5 iterations) with their full analyzable
    * plan while keeping 20+-iteration production runs bounded. The
    * final iteration is never checkpointed: callers get a lazy,
    * composable frame whose plan ends in at most `interval` joins.
    *
    * Output columns: (node LONG, rank LONG).
    */
  /** `tolMicro > 0` adds convergence stopping: after each iteration
    * the max per-node |Δrank| (micro-units) is measured — two extra
    * node-scale jobs per iteration (an eager checkpoint of the new
    * rank + one agg over the old⋈new diff) — and iteration stops
    * early once it drops below the tolerance. Leave 0 for the
    * fixed-count plan-only mode (no mid-build actions).
    */
  def pageRank(edges: DataFrame, iterations: Int,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointInterval: Int = 5,
      broadcastRanks: Boolean = true,
      tolMicro: Long = 0L): DataFrame =
    pageRankManaged(edges, iterations, srcCol, dstCol,
      checkpointInterval, broadcastRanks, tolMicro).ranks

  /** A rank table plus the hook that releases the persisted edge
    * list backing its lazy plan. Fixed-count mode returns a
    * COMPOSABLE frame whose plan still reads the cache — call
    * `release()` once the ranks are consumed (collected / written /
    * checkpointed); after release, re-executing the returned plan
    * recomputes the edge join from source instead of reading cache
    * (correct, just slower). Convergence mode's ranks are already
    * checkpointed, so its `release` has nothing left to free.
    */
  final case class Ranked(ranks: DataFrame, release: () => Unit)

  /** [[pageRank]] with an explicit cache-lifetime handle — the form
    * for repeated fixed-count calls in one session, where the bare
    * API's documented trade (edge cache lives until session GC)
    * would otherwise accumulate one persisted edge list per call.
    */
  def pageRankManaged(edges: DataFrame, iterations: Int,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointInterval: Int = 5,
      broadcastRanks: Boolean = true,
      tolMicro: Long = 0L): Ranked = {
    require(iterations >= 1, "pageRank needs iterations >= 1")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .withColumnRenamed("src", "node")
    val degDim = if (broadcastRanks) broadcast(deg) else deg
    val edgesDeg = e.join(degDim, e("src") === deg("node"))
      .select(col("src"), col("dst"), col("outdeg")).persist()
    var rank = deg.select(col("node"), lit(1000000L).as("rank"))
    var i = 1
    var converged = false
    while (i <= iterations && !converged) {
      val prev = rank
      val r = if (broadcastRanks) broadcast(rank) else rank
      rank = edgesDeg
        .join(r, edgesDeg("src") === rank("node"))
        .select(col("dst"),
          expr("(rank * 85) div (outdeg * 100)").as("c"))
        .groupBy("dst")
        .agg((lit(150000L) + sum("c")).as("rank"))
        .withColumnRenamed("dst", "node")
      if (tolMicro > 0L) {
        // materialize once; the delta agg AND the next iteration (or
        // the caller) read these blocks
        rank = rank.localCheckpoint(true)
        // Full-outer so a node present in only one of the two rank
        // tables (contract violation: some node had zero in-edges)
        // still counts its whole rank as delta instead of silently
        // dropping out of an inner join; the aggregate is null only
        // when BOTH tables are empty, which genuinely is convergence.
        val deltaRow = rank.as("n")
          .join(prev.select(col("node"), col("rank").as("__prev")),
            Seq("node"), "full_outer")
          .agg(max(abs(coalesce(col("rank"), lit(0L)) -
            coalesce(col("__prev"), lit(0L)))))
          .collect()(0)
        val maxDelta = if (deltaRow.isNullAt(0)) 0L
                       else deltaRow.getLong(0)
        converged = maxDelta <= tolMicro
      } else if (i % checkpointInterval == 0 && i < iterations) {
        rank = rank.localCheckpoint(true)
      }
      i += 1
    }
    // Convergence mode checkpoints every rank table, so the returned
    // frame no longer reads edgesDeg — release the cached blocks here
    // instead of leaking one persisted edge list per call. Fixed-count
    // mode returns a LAZY plan over edgesDeg; its release hook frees
    // the cache when the caller is done (the bare [[pageRank]] API
    // drops the hook — documented trade: composable plan vs eager
    // release — so session-long callers should use
    // [[pageRankManaged]]).
    if (tolMicro > 0L) {
      edgesDeg.unpersist(false)
      Ranked(rank, () => ())
    } else Ranked(rank, () => { edgesDeg.unpersist(false); () })
  }
}
