package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over similarity/relation graphs (extension — the
  * reference has no graph-analytic operators; its only traversal is the
  * per-pattern bind). Complements [[Dedup.connectedComponents]]: degrees
  * and triangle counts are the standard local-structure signals for
  * near-dup graph quality (a high-triangle cluster is a true clique of
  * variants; a high-degree low-triangle node is a hub false-positive).
  */
object GraphAnalytics {

  /** Per-node degree over an undirected pair list `(id1, id2)` — plain
    * DataFrame aggregation (one shuffle), no GraphX needed. */
  def degrees(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("id1").as("id"))
      .unionByName(pairs.select(col("id2").as("id")))
    ids.join(sym.groupBy("id").agg(count(lit(1)).as("__d")), Seq("id"),
        "left")
      .select(col("id"), coalesce(col("__d"), lit(0L)).as("degree"))
  }

  /** PageRank over an undirected pair list — fixed-iteration power
    * method with GraphX `staticPageRank` semantics: rank₀ = 1, rankᵢ₊₁ =
    * (1-d) + d·Σ_in rank/deg (unnormalized form, no dangling
    * redistribution — isolated nodes settle at 1-d). On near-dup /
    * citation / link graphs this is the standard centrality signal for
    * corpus quality weighting.
    *
    * DataFrame-native (stays columnar/codegen, unlike the GraphX hop):
    * each iteration is one hash-join of the edge list against the rank
    * table plus one partial-aggregated shuffle on the destination id;
    * `localCheckpoint` truncates lineage per round so iteration N never
    * replans rounds 1..N-1 (the same discipline as
    * [[Dedup.connectedComponents]] — swap for reliable `checkpoint` on a
    * real cluster). Work per round is O(|E|), rounds are fixed — no
    * diameter dependence.
    */
  def pageRank(ids: DataFrame, pairs: DataFrame, iterations: Int = 10,
               damping: Double = 0.85,
               checkpointInterval: Int = 5): DataFrame = {
    // checkpoint the symmetric edge list BEFORE it branches into deg and
    // the join: `pairs` is often an expensive upstream (a similarity
    // join) and both branches would otherwise recompute it in full
    val sym = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    // r17 adjudication: a co-partitioned loop (edges and an ids0
    // universe both pinned hash-partitioned at defaultParallelism so
    // the contribution join and rank-rebuild join plan exchange-free —
    // the trainLinearClassifier r17 shape) was built and measured
    // SLOWER in interleaved same-JVM A/B with the pair list pinned
    // outside the variants (old best 1.90 / med 2.24 s vs new 2.26 /
    // 2.70 s at gate scale, 10 rounds): the two setup
    // repartition+checkpoint jobs cost more than 10 iterations of
    // AQE-planned small joins save, and AQE's coalescing re-inserts a
    // mismatched-partition-count exchange at the contribution join
    // anyway. Falsified and reverted; numbers in OPTIMIZATION_r17.md.
    val edges = sym.join(deg, "a").localCheckpoint()
    var ranks = ids.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to iterations) {
      val contrib = edges.join(ranks, edges("a") === ranks("id"))
        .groupBy(col("b").as("id"))
        .agg(sum(col("rank") / col("deg")).as("__c"))
      ranks = ids.select(col("id")).join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("rank"))
      // lineage truncation every `checkpointInterval` rounds (GraphX
      // Pregel's discipline), not every round: each eager checkpoint is
      // a full job, and a handful of join+agg plan levels replan fine —
      // checkpoint cost should amortize over rounds, not dominate them
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts via GraphX's TriangleCount (Pregel-land
    * analytics on Long ids — the "SPARQL patterns to GraphX analytics"
    * bridge). Nodes in `ids` absent from the pair graph count 0.
    * For the DataFrame-native path at 100 TB, the same count is a
    * 3-way self-join on the canonical (id1 < id2) edge list; GraphX is
    * used here because triangle counting is genuinely graph-shaped and
    * its edge-partitioned implementation avoids materializing the
    * 2-hop candidate explosion a naive SQL join plans. */
  def triangleCounts(ids: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
    val spark = ids.sparkSession
    val verts = ids.select(col("id").cast("long")).rdd
      .map(r => (r.getLong(0), 0))
    val edges = pairs
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .filter(col("id1") =!= col("id2")).distinct().rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val g = Graph(verts, edges)
      .partitionBy(PartitionStrategy.RandomVertexCut)
    val tc = org.apache.spark.graphx.lib.TriangleCount.run(g)
    spark.createDataFrame(tc.vertices.map { case (id, n) => (id, n.toLong) })
      .toDF("id", "triangles")
  }
}
