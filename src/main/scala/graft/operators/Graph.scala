package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the PageRank twin of
  * [[Dedup.connectedComponents]], built on the same loop discipline:
  * node/edge-keyed relations only, one shuffle per iteration, eager
  * `localCheckpoint` to keep the lineage flat, and never a
  * data-proportional collect (the only driver-side value is the node
  * count, one long).
  */
object Graph {

  /** Weighted PageRank by power iteration: `iters` rounds of
    *
    *   rank'(v) = (1-d)/n + d · Σ_{(u,v)∈E} rank(u) · w(u,v) / outw(u)
    *
    * Each round is ONE edge-keyed join (edges × node-sized ranks on the
    * src key) and ONE dst-keyed aggregate — the standard distributed
    * formulation; at 100 TB the edge relation partitions on its join
    * keys and the rank state stays node-sized. Dangling nodes (no
    * out-edges) simply leak their damped mass — the common simplified
    * variant; documented rather than redistributed, and the golden spec
    * pins it against a driver-side reference with the same convention.
    *
    * Per-node contribution terms are scaled to exact 1e-12-grain LONGS
    * before the dst-keyed fold, so the per-iteration sum is INTEGER
    * arithmetic — bit-identical under any reduce order or partitioning,
    * the exempt lane's determinism contract. (A 12-dp double pre-round
    * is NOT enough: the double sum of rounded terms still differs by an
    * ulp across fold orders, and one ulp at a round-half boundary flips
    * the printed 12th decimal — observed live at sf0.01.) Scaled ranks
    * are ≤1e12 so the fold cannot overflow a long.
    *
    * `edges` columns: (srcCol, dstCol, weightCol). Multi-edges are
    * legal (they just add weight). Returns (node, rank).
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, damping: Double = 0.85,
               iters: Int = 15): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
    val outw = e0.groupBy("src").agg(sum(col("w")).as("outw"))
    val e = e0.join(outw, Seq("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("rank") * col("w") / col("outw") * lit(1e12))
            .cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in"))
      // left join: nodes with no in-edges keep the teleport floor
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(base) + lit(damping) *
            (coalesce(col("in"), lit(0L)).cast("double") / lit(1e12)), 12)
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
