package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Laws for the iterative graph pack ([[graft.operators.Graph]]) and its
  * registry ids. The PageRank golden is pinned against an INDEPENDENT
  * driver-side reference that replicates the library's two documented
  * conventions — dangling-mass leak (no redistribution) and exact
  * 1e-12-grain scaled-long contribution folds — so a silent change to
  * either shows up as a numeric diff, not a re-derived test. */
class GraphSpec extends SparkSpec {

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  // Spark's `round(doubleExpr)` (scale 0, HALF_UP) — the term scaling
  private def toPico(x: Double): Long =
    BigDecimal(x * 1e12).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Reference power iteration, same conventions as [[Graph.pagerank]]. */
  private def refPagerank(edges: Seq[(Long, Long, Double)], damping: Double,
                          iters: Int): Map[Long, Double] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val base = (1.0 - damping) / n
    var rank = nodes.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _, w) => toPico(rank(u) * w / outw(u)) }.sum
      }.toMap
      rank = nodes.map(v =>
        v -> r12(base + damping * (in.getOrElse(v, 0L).toDouble / 1e12))).toMap
    }
    rank
  }

  private def edgeDf(edges: Seq[(Long, Long, Double)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst", "w")
  }

  // a source node (1: no in-edges), a dangling node (4: no out-edges),
  // a 2↔3 cycle, and uneven weights — every convention exercised
  private val g: Seq[(Long, Long, Double)] =
    Seq((1L, 2L, 1.0), (1L, 3L, 3.0), (2L, 3L, 1.0), (3L, 2L, 2.0),
      (2L, 4L, 1.0), (3L, 4L, 1.0))

  test("pagerank matches the driver-side reference on the golden graph") {
    val got = Graph.pagerank(edgeDf(g), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPagerank(g, 0.85, 15)
    assert(got.keySet == want.keySet)
    for ((v, r) <- want)
      assert(math.abs(got(v) - r) < 1e-9, s"node $v: got ${got(v)}, want $r")
    // source node holds exactly the teleport floor
    assert(math.abs(got(1L) - r12(0.15 / 4)) < 1e-12)
  }

  test("multi-edges add weight: duplicated edge == single double-weight edge") {
    val dup = g ++ Seq((1L, 2L, 1.0))
    val merged = g.map { case (s0, d0, w0) =>
      if ((s0, d0) == ((1L, 2L))) (s0, d0, w0 + 1.0) else (s0, d0, w0)
    }
    val a = Graph.pagerank(edgeDf(dup), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pagerank(edgeDf(merged), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    for ((v, r) <- b) assert(math.abs(a(v) - r) < 1e-12, s"node $v")
  }

  test("rank mass: positive everywhere, ≤1 (dangling leak), floor respected") {
    val got = Graph.pagerank(edgeDf(g), "src", "dst", "w")
      .collect().map(_.getDouble(1))
    val floor = 0.15 / 4
    assert(got.forall(r => r >= floor - 1e-12), "every rank ≥ teleport floor")
    val total = got.sum
    assert(total <= 1.0 + 1e-9, s"leaky formulation can't exceed 1: $total")
    assert(total > floor * 4, "damped mass flows somewhere")
  }

  test("q_pagerank: nation trade ranks at the unit fixture") {
    val rows = Queries.all.toMap.apply("q_pagerank")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.forall(_ > 0))
    // registered ORDER BY desc(rank) — pinned here so a contract change
    // (the driver hash-compares ordered output) can't slip silently
    assert(ranks.sameElements(ranks.sortBy(-_)))
    // supplier nations (the only in-edge targets) outrank pure customer
    // nations, which all sit at the teleport floor
    val floor = ranks.min
    assert(ranks.max > floor * 2, "trade mass concentrates on supplier nations")
  }

  /** Reference label propagation, same conventions as
    * [[Graph.labelPropagation]] (cent-long folds, (weight, -label) argmax). */
  private def refLabelProp(edges: Seq[(Long, Long, Double)],
                           iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map { case (u, v, w) => ((math.min(u, v), math.max(u, v)),
        BigDecimal(w * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val inc = und.toSeq.flatMap { case ((a, b), wc) =>
      Seq((a, b, wc), (b, a, wc)) }
    var labels = inc.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = inc.groupBy(_._1).view.mapValues { es =>
        es.groupBy(e => labels(e._2)).view.mapValues(_.map(_._3).sum)
          .toSeq.maxBy { case (lbl, w) => (w, -lbl) }._1
      }.toMap
    }
    labels
  }

  test("triangleCensus: K4 + pendant, with self-loops/reverse/parallel noise") {
    // K4 on {1,2,3,4} (4 triangles) + pendant 4—5; a self-loop, a
    // reversed duplicate, and a parallel edge must all normalize away
    val edges: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0),
        (2L, 4L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0),
        (2L, 2L, 9.0), (2L, 1L, 1.0), (1L, 2L, 5.0))
    val row = Graph.triangleCensus(edgeDf(edges), "src", "dst", "w").collect().head
    assert(row.getLong(0) == 5, "n_nodes")
    assert(row.getLong(1) == 7, "n_edges")
    assert(row.getLong(2) == 4, "n_triangles")
    // same graph: degrees (3,3,3,4,1) → 15 wedges, coeff = 12/15
    val cc = Graph.clusteringCensus(edgeDf(edges), "src", "dst", "w").collect().head
    assert(cc.getLong(0) == 15, "n_wedges")
    assert(cc.getLong(1) == 4)
    assert(math.abs(cc.getDouble(2) - 0.8) < 1e-12, "global clustering 12/15")
    // local: K4 nodes are in 3 triangles each — 1,2,3 fully clustered
    // (2·3/(3·2)=1.0), node 4 diluted by the pendant (2·3/(4·3)=0.5),
    // node 5 deg-1 → 0.0
    val lc = Graph.localClustering(edgeDf(edges), "src", "dst", "w")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(lc(1L) == ((3L, 3L, 1.0)) && lc(2L) == ((3L, 3L, 1.0)) &&
      lc(3L) == ((3L, 3L, 1.0)))
    assert(lc(4L) == ((4L, 3L, 0.5)))
    assert(lc(5L) == ((1L, 0L, 0.0)))
  }

  test("pagerank: single-task fixpoint is bit-identical to the distributed loop") {
    // the size gate picks the one-task path for every graph this small;
    // localMaxEdges = 0 forces the distributed loop so BOTH paths stay
    // exercised and their exact (==, not tolerance) parity is law
    val local = Graph.pagerank(edgeDf(g), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pagerank(edgeDf(g), "src", "dst", "w", localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == dist, s"paths diverged:\nlocal $local\ndist  $dist")
  }

  test("pagerank path parity holds on 5k pseudorandom edges") {
    val edges = spark.range(5000).select(
      pmod(hash(col("id")), lit(300)).cast("long").as("src"),
      pmod(hash(col("id") * 7 + 1), lit(300)).cast("long").as("dst"),
      lit(1.0).as("w"))
      .where(col("src") =!= col("dst")).localCheckpoint(true)
    val local = Graph.pagerank(edges, "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pagerank(edges, "src", "dst", "w", localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == dist)
  }

  test("labelPropagation: single-task fixpoint == distributed loop") {
    val barbell: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
        (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
        (3L, 4L, 0.1))
    val local = Graph.labelPropagation(edgeDf(barbell), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.labelPropagation(edgeDf(barbell), "src", "dst", "w",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("undirect unit contract: integer weights as-is == doubles quantized to cents") {
    // the registry callers pass integer CENTS; re-scaling those by 100
    // would fold hundredths-of-cents and burn 100× of the 2^53 headroom.
    // Labeling is invariant under the uniform ×100, so the long-weight
    // graph must land on exactly the double-weight labels.
    val s = spark
    import s.implicits._
    val dbl: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
        (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
        (3L, 4L, 0.1))
    val cents = dbl.map { case (a, b, w) => (a, b, math.round(w * 100)) }
    val viaDouble = Graph.labelPropagation(edgeDf(dbl), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLong = Graph.labelPropagation(
        cents.toDF("src", "dst", "w"), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDouble == viaLong)
  }

  test("clusteringCensus: wedge-free graph reports 0.0, not NaN") {
    // one isolated edge: zero wedges → the 3·tri/wedges division is 0/0
    val lone = edgeDf(Seq((1L, 2L, 1.0)))
    val row = Graph.clusteringCensus(lone, "src", "dst", "w").collect().head
    assert(row.getLong(0) == 0 && row.getLong(1) == 0)
    assert(row.getDouble(2) == 0.0, "guarded division must yield 0.0")
  }

  test("assortativity: star graph is perfectly disassortative; regular graph guards to 0") {
    // S4 star: hub degree 4, leaves degree 1 → every edge pairs extreme
    // degrees → r = −1 exactly (integer arithmetic end to end)
    val star = edgeDf(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0),
      (0L, 4L, 1.0)))
    val s = Graph.assortativityCensus(star, "src", "dst", "w").collect().head
    assert(s.getLong(0) == 4)
    assert(s.getDouble(1) == -1.0, s"star assortativity: ${s.getDouble(1)}")
    // K4 is 3-regular: zero degree variance → guarded 0.0, not NaN
    val k4 = edgeDf(Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0),
      (2L, 3L, 1.0), (2L, 4L, 1.0), (3L, 4L, 1.0)))
    val k = Graph.assortativityCensus(k4, "src", "dst", "w").collect().head
    assert(k.getLong(0) == 6 && k.getDouble(1) == 0.0)
    // registry id: r bounded in [−1, 1]
    val row = Queries.all.toMap.apply("q_graph_assortativity")(spark, sfDir)
      .collect().head
    assert(row.getLong(0) > 0)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("labelPropagation matches the reference and splits the barbell") {
    // two tight triangles bridged by one weak edge
    val barbell: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
        (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
        (3L, 4L, 0.1))
    val got = Graph.labelPropagation(edgeDf(barbell), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refLabelProp(barbell, 10)
    assert(got == want, s"got $got want $want")
    assert(Set(got(1L), got(2L), got(3L)).size == 1, "left block one community")
    assert(Set(got(4L), got(5L), got(6L)).size == 1, "right block one community")
    assert(got(1L) != got(4L), "weak bridge does not merge the blocks")
  }

  test("triangleCensus: degree-ordered == naive numeric closure, 5k pseudorandom edges") {
    // deterministic pseudorandom multigraph (hash arithmetic, no RNG):
    // ~5k directed edges over ~300 nodes, duplicates/self-loops included
    val edges = spark.range(5000).select(
      pmod(hash(col("id")), lit(300)).cast("long").as("src"),
      pmod(hash(col("id") * 7 + 1), lit(300)).cast("long").as("dst"),
      lit(1.0).as("w"))
    val fast = Graph.triangleCensus(edges, "src", "dst", "w").collect().head
    // independent naive formulation — the oracle's a<b<c convention,
    // expressed directly in DataFrames (quadratic wedges; fine at test
    // scale, the thing the degree-ordered plan exists to avoid)
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint(true)
    val e1 = und.select(col("a").as("x"), col("b").as("y"))
    val e2 = und.select(col("a").as("y"), col("b").as("z"))
    val e3 = und.select(col("a").as("x"), col("b").as("z"))
    val naive = e1.join(e2, "y").join(e3, Seq("x", "z")).count()
    assert(fast.getLong(2) == naive,
      s"degree-ordered census ${fast.getLong(2)} != naive closure $naive")
    assert(fast.getLong(1) == und.count(), "edge counts agree")
  }

  /** Driver-side Dijkstra, same conventions as [[Graph.shortestPaths]]:
    * undirected, self-loops dropped, parallel edges merged as cent-long
    * sums, exact integer distances. */
  private def refDijkstra(edges: Seq[(Long, Long, Double)],
                          source: Long): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map { case (u, v, w) => ((math.min(u, v), math.max(u, v)),
        BigDecimal(w * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val adj = und.toSeq.flatMap { case ((a, b), wc) =>
      Seq(a -> (b, wc), b -> (a, wc)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = scala.collection.mutable.Map(source -> 0L)
    val done = scala.collection.mutable.Set.empty[Long]
    val pq = scala.collection.mutable.PriorityQueue((0L, source))(
      Ordering.by { case (d, _) => -d })
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (!done(u)) {
        done += u
        for ((v, w) <- adj.getOrElse(u, Nil) if !done(v)) {
          val nd = d + w
          if (nd < dist.getOrElse(v, Long.MaxValue)) {
            dist(v) = nd; pq.enqueue((nd, v))
          }
        }
      }
    }
    dist.toMap
  }

  test("shortestPaths matches driver Dijkstra; unreachable nodes absent") {
    // weighted diamond (1-2-4 longer than 1-3-4), a far chain node, an
    // unreachable island {8,9}, plus self-loop/parallel-edge noise
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0),
        (1L, 1L, 9.0), (3L, 1L, 1.5))
    val got = Graph.shortestPaths(edgeDf(wg), "src", "dst", "w", source = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refDijkstra(wg, 1L)
    assert(got == want, s"got $got want $want")
    assert(!got.contains(8L) && !got.contains(9L), "island must be absent")
    assert(got(1L) == 0L, "source at distance zero")
    // parallel edges 1-3 (2.0) and 3-1 (1.5) merge to 3.5 < direct 1-2=5
    assert(got(4L) == want(4L) && want(4L) == 650L,
      "cent-exact min path through the merged 1-3 edge")
  }

  test("shortestPaths: single-task fixpoint == distributed loop") {
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0),
        (1L, 1L, 9.0), (3L, 1L, 1.5))
    val local = Graph.shortestPaths(edgeDf(wg), "src", "dst", "w", source = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.shortestPaths(edgeDf(wg), "src", "dst", "w", source = 1L,
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("shortestPaths: isolated source yields the single 0-distance row") {
    val got = Graph.shortestPaths(edgeDf(g), "src", "dst", "w", source = 99L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(99L -> 0L))
  }

  test("q_graph_components: labels are component minima over the trade graph") {
    val rows = Queries.all.toMap.apply("q_graph_components")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.length == 25, "left join onto the full nation dim")
    // every component's label is the minimum nationkey inside it, so
    // labels are a subset of [0, 25) and the count of distinct labels
    // equals the count of components
    assert(rows.forall { case (_, c) => c >= 0 && c < 25 })
    // nations with any trade edge share labels consistently: a directed
    // edge implies same component
    def asLong(v: Any): Long = v.asInstanceOf[Number].longValue
    val byNation = rows.toMap
    val names = graft.sources.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => asLong(r.get(0)) -> r.getString(1)).toMap
    val edges = Queries.nationTradeEdges(spark, sfDir)
      .select("src", "dst").collect()
      .map(r => (asLong(r.get(0)), asLong(r.get(1))))
    assert(edges.nonEmpty)
    for ((s0, d0) <- edges)
      assert(byNation(names(s0)) == byNation(names(d0)),
        s"edge $s0->$d0 spans two components")
  }

  test("q_graph_sssp: source nation at 0.0, ordered by distance") {
    val rows = Queries.all.toMap.apply("q_graph_sssp")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val dists = rows.map(_.getDouble(1))
    assert(dists.head == 0.0, "the source nation leads at distance zero")
    assert(dists.sameElements(dists.sorted), "registered ORDER BY dist_w")
    assert(dists.forall(_ >= 0.0))
  }

  test("graph registry ids: census sanity at the unit fixture") {
    val byName = Queries.all.toMap
    val tri = byName("q_graph_triangles")(spark, sfDir).collect().head
    val (nodes, edges, tris) = (tri.getLong(0), tri.getLong(1), tri.getLong(2))
    assert(nodes <= 25 && edges <= nodes * (nodes - 1) / 2)
    assert(tris >= 0)
    val rec = byName("q_graph_reciprocity")(spark, sfDir).collect().head
    assert(rec.getLong(0) > 0)
    assert(rec.getLong(1) <= rec.getLong(0))
    val ratio = rec.getDouble(2)
    assert(ratio >= 0.0 && ratio <= 1.0)
    val comm = byName("q_graph_communities")(spark, sfDir).collect()
    assert(comm.nonEmpty && comm.length <= 25)
  }

  /** Driver-side harmonic closeness replicating the library's exact
    * arithmetic: Dijkstra distances per source (cent-longs), each 1/d
    * term pico-rounded to a long, integer-summed, 6-dp display. */
  private def refHarmonicCloseness(edges: Seq[(Long, Long, Double)],
                                   sources: Seq[Long]): Map[Long, (Long, Double)] = {
    val nodes = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1, e._2)).distinct
    val perSource = sources.map(s0 => s0 -> refDijkstra(edges, s0)).toMap
    nodes.map { v =>
      val terms = sources.flatMap { s0 =>
        perSource(s0).get(v).filter(d => s0 != v && d > 0L)
      }
      val ts = terms.map(d => toPico(100.0 / d)).sum
      val c = BigDecimal(ts.toDouble / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      v -> (terms.size.toLong, c)
    }.toMap
  }

  test("harmonicCloseness matches the driver all-pairs Dijkstra golden") {
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0),
        (1L, 1L, 9.0), (3L, 1L, 1.5))
    val got = Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L)
    val want = refHarmonicCloseness(wg, nodes.sorted)
    assert(got == want, s"got $got want $want")
    // island pair reaches only each other; main component never reaches it
    assert(got(8L)._1 == 1L && got(9L)._1 == 1L && got(1L)._1 == 4L)
  }

  test("harmonicCloseness: single-task == distributed; landmark subset folds") {
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0))
    def run(localMax: Long, srcs: Option[Seq[Long]]) =
      Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w",
          sources = srcs, localMaxEdges = localMax)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(run(0L, None) == run(Graph.LocalFixpointMaxEdges, None))
    // landmark sampling contract: a source subset folds only its terms
    val sub = run(Graph.LocalFixpointMaxEdges, Some(Seq(1L, 8L)))
    assert(sub == refHarmonicCloseness(wg, Seq(1L, 8L)))
  }

  test("q_graph_closeness: trade-graph centralities are sane and ordered") {
    val rows = Queries.all.toMap.apply("q_graph_closeness")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val cs = rows.map(_.getDouble(2))
    assert(cs.forall(_ >= 0.0))
    assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
    assert(rows.map(_.getLong(1)).forall(n => n >= 0L && n <= 24L))
  }

  test("betweenness: path, star and split-path structural goldens") {
    // P4 (1-2-3-4): inner nodes carry 2.0 each, endpoints 0
    val p4 = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
    val gotP = Graph.betweenness(edgeDf(p4), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotP == Map(1L -> 0.0, 2L -> 2.0, 3L -> 2.0, 4L -> 0.0), s"$gotP")
    // star S4: hub carries all C(3,2)=3 pairs, leaves 0
    val s4 = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0))
    val gotS = Graph.betweenness(edgeDf(s4), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotS == Map(0L -> 3.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0), s"$gotS")
    // diamond (4-cycle) 1-2-4 / 1-3-4: each crossing pair — (1,4) and
    // (2,3) — splits over two equal shortest paths, so EVERY node lies
    // on half of exactly one pair: σ-weighted dependency = 0.5 each
    val dia = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 4L, 1.0), (3L, 4L, 1.0))
    val gotD = Graph.betweenness(edgeDf(dia), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotD == Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 0.5), s"$gotD")
  }

  test("betweenness: single-task == distributed; weights ignored") {
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0), (1L, 1L, 9.0))
    val local = Graph.betweenness(edgeDf(wg), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.betweenness(edgeDf(wg), "src", "dst", "w",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == dist, s"local $local dist $dist")
    // hop-count semantics: reweighting every edge changes nothing
    val rw = Graph.betweenness(edgeDf(wg.map { case (a, b, _) => (a, b, 7.0) }),
        "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rw == local)
    // island edge 8-9: no third node, zero betweenness
    assert(local(8L) == 0.0 && local(9L) == 0.0)
  }

  /** Independent per-source Brandes replicating the library's
    * documented pico-quantized δ arithmetic. */
  private def refBetweenness(edges: Seq[(Long, Long, Double)]): Map[Long, Double] = {
    def pico(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val simple = edges.collect { case (a, b, _) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val adj = simple.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val dps = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { s0 =>
      val dist = scala.collection.mutable.HashMap(s0 -> 0)
      val sigma = scala.collection.mutable.HashMap(s0 -> 1L)
      var frontier = Seq(s0)
      val order = scala.collection.mutable.ArrayBuffer(frontier)
      var d = 0
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
        frontier.foreach { v =>
          adj(v).foreach { w =>
            if (!dist.contains(w)) next(w) = next.getOrElse(w, 0L) + sigma(v)
          }
        }
        frontier = next.keys.toSeq
        frontier.foreach { w => dist(w) = d + 1; sigma(w) = next(w) }
        if (frontier.nonEmpty) order += frontier
        d += 1
      }
      val dp = scala.collection.mutable.HashMap.empty[Long, Long]
      (order.length - 1 to 1 by -1).foreach { lvl =>
        order(lvl).foreach { w =>
          val dw = dp.getOrElse(w, 0L)
          adj(w).foreach { v =>
            if (dist.get(v).contains(lvl - 1))
              dp(v) = dp.getOrElse(v, 0L) +
                pico(sigma(v).toDouble / sigma(w).toDouble * (1e12 + dw.toDouble))
          }
        }
      }
      dp.foreach { case (v, x) => if (v != s0) dps(v) = dps.getOrElse(v, 0L) + x }
    }
    nodes.map { v =>
      v -> BigDecimal(dps.getOrElse(v, 0L).toDouble / 2e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("betweenness matches the independent reference on random graphs (both paths)") {
    def lcgEdges(n: Int, nodes: Long, seed: Long): Seq[(Long, Long, Double)] = {
      var x = seed
      def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
      (1 to n).map { _ =>
        (math.floorMod(nxt(), nodes), math.floorMod(nxt(), nodes), 1.0)
      }.filter { case (a, b, _) => a != b }
    }
    // one-task path: 800 pseudorandom edges over 200 nodes
    val big = lcgEdges(800, 200L, 42L)
    val gotBig = Graph.betweenness(edgeDf(big), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotBig == refBetweenness(big))
    // distributed path forced on a smaller graph
    val small = lcgEdges(60, 25L, 7L)
    val gotSmall = Graph.betweenness(edgeDf(small), "src", "dst", "w",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotSmall == refBetweenness(small))
  }

  test("q_graph_betweenness: trade-graph centralities are sane and ordered") {
    val rows = Queries.all.toMap.apply("q_graph_betweenness")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val bs = rows.map(_.getDouble(1))
    assert(bs.forall(_ >= 0.0))
    assert(bs.sameElements(bs.sorted(Ordering[Double].reverse)))
  }

  private def lcgEdges(n: Int, nodes: Long, seed: Long): Seq[(Long, Long, Double)] = {
    var x = seed
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (1 to n).map { _ =>
      (math.floorMod(nxt(), nodes), math.floorMod(nxt(), nodes), 1.0)
    }.filter { case (a, b, _) => a != b }
  }

  test("landmark centrality: K = n degenerates to the exact form (both operators, both paths)") {
    val wg = lcgEdges(60, 20L, 11L)
    val nV = wg.flatMap(e => Seq(e._1, e._2)).distinct.size
    def bmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactB = bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w"))
    // landmarkK covering every node: selection = all nodes, scale = 1.0
    // exactly — the estimator machinery must be bit-identical to exact
    assert(bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(nV))) == exactB)
    assert(bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(nV), localMaxEdges = 0L)) == exactB)
    def cmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exactC = cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w"))
    assert(cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(nV))) == exactC)
    assert(cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(nV), localMaxEdges = 0L)) == exactC)
  }

  test("landmark betweenness: accuracy band vs exact; parity across the gate") {
    // the 100 TB claim, measured: K = n/2 md5-picked landmarks,
    // extrapolated by n/K, must land inside a pinned band of the exact
    // values on the seeded random fixture (Brandes–Pich 2007 — the
    // estimator is unbiased over uniform samples; the md5 pick is one
    // fixed sample, so the band is measured once and pinned with slack)
    val wg = lcgEdges(120, 30L, 23L)
    val nV = wg.flatMap(e => Seq(e._1, e._2)).distinct.size
    val k = nV / 2
    def bmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w"))
    val est = bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(k)))
    // one-task == distributed in landmark mode too (same md5 selection,
    // same scale, same pico arithmetic)
    val estDist = bmap(Graph.betweenness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(k), localMaxEdges = 0L))
    assert(est == estDist, s"landmark parity: $est vs $estDist")
    assert(est.keySet == exact.keySet)
    val meanExact = exact.values.sum / exact.size
    val mae = exact.keys.map(v => math.abs(est(v) - exact(v))).sum / exact.size
    assert(mae <= 0.5 * meanExact,
      s"landmark MAE $mae exceeds half the mean exact value $meanExact")
    // rank fidelity at the top: the exact argmax stays in the estimated
    // top quartile (what a landmark screen is actually used for)
    val topExact = exact.maxBy(p => (p._2, -p._1))._1
    val topQuartile = est.toSeq.sortBy(p => (-p._2, p._1))
      .take(math.max(1, nV / 4)).map(_._1).toSet
    assert(topQuartile.contains(topExact),
      s"exact argmax $topExact missing from estimated top quartile $topQuartile")
  }

  test("landmark closeness: accuracy band; n_reached bounded by K") {
    val wg = lcgEdges(120, 30L, 23L)
    val nV = wg.flatMap(e => Seq(e._1, e._2)).distinct.size
    val k = nV / 2
    def cmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w"))
    val est = cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(k)))
    assert(est == cmap(Graph.harmonicCloseness(edgeDf(wg), "src", "dst", "w",
      landmarkK = Some(k), localMaxEdges = 0L)))
    // the visible cost witness: only K sources were swept
    assert(est.values.forall(_._1 <= k.toLong),
      s"n_reached exceeds landmark count $k: $est")
    val meanExact = exact.values.map(_._2).sum / exact.size
    val mae = exact.keys.map(v => math.abs(est(v)._2 - exact(v)._2)).sum / exact.size
    assert(mae <= 0.35 * meanExact,
      s"landmark closeness MAE $mae exceeds band (mean exact $meanExact)")
  }

  test("landmark forward state is K·n rows, not n² (cost ∝ landmarks)") {
    val s = spark
    import s.implicits._
    // connected graph: a ring over 16 nodes — every source reaches all
    val ring = (0L until 16L).map(i => (i, (i + 1) % 16, 1.0))
    val und = edgeDf(ring).select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"))
    val incSym = und.select(col("a").as("n"), col("b").as("m"))
      .union(und.select(col("b").as("n"), col("a").as("m")))
    val k = 3
    val srcDf = Seq(0L, 5L, 11L).toDF("s")
    val (visited, _) = Graph.brandesForwardState(incSym, srcDf, 60)
    try assert(visited.count() == k * 16L,
      s"forward state must be K·V = ${k * 16}, got ${visited.count()}")
    finally visited.unpersist(blocking = false)
  }

  test("betweenness distributed loops hold O(1) checkpoint state, not O(levels)") {
    // a long path (diameter 11): the old leak pattern held one
    // superseded (src × node) checkpoint per BFS round plus one per
    // backward level — ~2·diameter blocks; the fixed loops keep only
    // the live state (und + final δ) plus bounded slack
    val p12 = (1L until 12L).map(i => (i, i + 1, 1.0))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Graph.betweenness(edgeDf(p12), "src", "dst", "w",
      localMaxEdges = 0L)
    out.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 4,
      s"betweenness left ${leaked.size} checkpoint RDDs registered — " +
        "per-level state is leaking again")
    out.unpersist(blocking = false)
  }

  /** Independent driver-side Dijkstra–Brandes replicating the library's
    * conventions: per-pair cent quantization then parallel-edge weight
    * sum (the [[Graph.undirect]] contract), exact long distances and σ,
    * descending-distance dependency sweep with pico-quantized δ. */
  private def refBetweennessWeighted(
      edges: Seq[(Long, Long, Double)]): Map[Long, Double] = {
    def pico(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val und = edges.collect { case (a, b, w) if a != b =>
        ((math.min(a, b), math.max(a, b)),
          BigDecimal(w * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val adj = und.toSeq.flatMap { case ((a, b), wc) =>
      Seq(a -> (b, wc), b -> (a, wc)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq.sorted
    val dps = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { s0 =>
      val dist = scala.collection.mutable.HashMap(s0 -> 0L)
      val sigma = scala.collection.mutable.HashMap(s0 -> 1L)
      val settled = scala.collection.mutable.ArrayBuffer.empty[Long]
      val done = scala.collection.mutable.HashSet.empty[Long]
      val pq = scala.collection.mutable.PriorityQueue
        .empty[(Long, Long)](Ordering.by[(Long, Long), (Long, Long)](
          p => (-p._1, -p._2)))
      pq.enqueue((0L, s0))
      while (pq.nonEmpty) {
        val (d0, u) = pq.dequeue()
        if (!done(u) && dist(u) == d0) {
          done += u; settled += u
          adj(u).foreach { case (v, wc) =>
            val cand = d0 + wc
            val dv = dist.get(v)
            if (dv.forall(cand < _)) {
              dist(v) = cand; sigma(v) = sigma(u); pq.enqueue((cand, v))
            } else if (dv.contains(cand)) sigma(v) += sigma(u)
          }
        }
      }
      val dp = scala.collection.mutable.HashMap.empty[Long, Long]
      settled.reverseIterator.foreach { w =>
        val dw = dp.getOrElse(w, 0L)
        adj(w).foreach { case (v, wc) =>
          if (dist.get(v).contains(dist(w) - wc)) {
            dp(v) = dp.getOrElse(v, 0L) +
              pico(sigma(v).toDouble / sigma(w).toDouble * (1e12 + dw.toDouble))
          }
        }
      }
      dp.foreach { case (v, x) => if (v != s0) dps(v) = dps.getOrElse(v, 0L) + x }
    }
    nodes.map { v =>
      v -> BigDecimal(dps.getOrElse(v, 0L).toDouble / 2e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("betweennessWeighted: weight-reroute golden; hop-count twin disagrees") {
    // triangle 1-2 (1.0), 2-3 (1.0), 1-3 (3.0): the cheapest 1↔3 route
    // runs THROUGH 2 (cost 2 < 3), so 2 carries the pair under weights
    // while hop-count sees a direct edge and gives 2 nothing
    val tri = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 3.0))
    val w = Graph.betweennessWeighted(edgeDf(tri), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == Map(1L -> 0.0, 2L -> 1.0, 3L -> 0.0), s"$w")
    val h = Graph.betweenness(edgeDf(tri), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(2L) == 0.0, s"hop-count must not route through 2: $h")
    // strictly positive weights are a contract, not a wish
    intercept[IllegalArgumentException] {
      Graph.betweennessWeighted(
        edgeDf(Seq((1L, 2L, 0.0), (2L, 3L, 1.0))), "src", "dst", "w")
        .collect()
    }
  }

  test("betweennessWeighted: uniform weights degenerate to hop-count exactly") {
    // equal weights preserve the shortest-path structure, σ and δ — the
    // weighted machinery must reproduce hop-count betweenness verbatim.
    // Deduplicate the pair list first: undirect SUMS parallel edges, so
    // a repeated pair would carry weight 2.0 and break uniformity
    val g = lcgEdges(80, 20L, 5L)
      .map { case (a, b, _) => (math.min(a, b), math.max(a, b), 1.0) }
      .distinct
    val hop = Graph.betweenness(edgeDf(g), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wtd = Graph.betweennessWeighted(edgeDf(g), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wtd == hop, s"weighted $wtd != hop-count $hop under uniform weights")
  }

  test("betweennessWeighted matches the driver reference; one-task == distributed") {
    // varied weights with deliberate parallel edges (undirect sums them)
    def wEdges(n: Int, nodes: Long, seed: Long): Seq[(Long, Long, Double)] = {
      var x = seed
      def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
      (1 to n).map { _ =>
        (math.floorMod(nxt(), nodes), math.floorMod(nxt(), nodes),
          (math.floorMod(nxt(), 9L) + 1L) / 2.0)
      }.filter { case (a, b, _) => a != b }
    }
    val big = wEdges(400, 60L, 99L)
    val gotBig = Graph.betweennessWeighted(edgeDf(big), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotBig == refBetweennessWeighted(big))
    val small = wEdges(50, 16L, 3L)
    val local = Graph.betweennessWeighted(edgeDf(small), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val distd = Graph.betweennessWeighted(edgeDf(small), "src", "dst", "w",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local == distd, s"local $local dist $distd")
    assert(local == refBetweennessWeighted(small))
  }

  test("eccentricity matches the driver all-pairs Dijkstra; landmark subset exact; parity") {
    val wg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 5.0), (2L, 4L, 5.0), (1L, 3L, 2.0), (3L, 4L, 3.0),
        (4L, 5L, 10.0), (2L, 3L, 0.5), (8L, 9L, 1.0), (1L, 1L, 9.0))
    def run(srcs: Option[Seq[Long]], localMax: Long) =
      Graph.eccentricity(edgeDf(wg), "src", "dst", "w", sources = srcs,
          localMaxEdges = localMax)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(None, Graph.LocalFixpointMaxEdges)
    // driver reference: per-source Dijkstra, ecc = max reached distance
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L)
    val want = nodes.map { s0 =>
      val d = refDijkstra(wg, s0).filter { case (v, _) => v != s0 }
      s0 -> (d.size.toLong, d.values.max)
    }.toMap
    assert(got == want, s"got $got want $want")
    // the island pair sees only each other: ecc = its single edge
    assert(got(8L) == ((1L, 100L)) && got(9L) == ((1L, 100L)))
    // one-task == distributed (shared fixpoint, shared fold)
    assert(run(None, 0L) == got)
    // landmark/sources mode: EXACT eccentricities for just those
    // sources — no extrapolation (a sampled max is a lower bound)
    val sub = run(Some(Seq(1L, 8L)), Graph.LocalFixpointMaxEdges)
    assert(sub.keySet == Set(1L, 8L) && sub(1L) == want(1L) && sub(8L) == want(8L))
  }

  test("eccentricity matches the driver reference on random weighted graphs (both paths)") {
    def wEdges(n: Int, nodes: Long, seed: Long): Seq[(Long, Long, Double)] = {
      var x = seed
      def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
      (1 to n).map { _ =>
        (math.floorMod(nxt(), nodes), math.floorMod(nxt(), nodes),
          (math.floorMod(nxt(), 9L) + 1L) / 2.0)
      }.filter { case (a, b, _) => a != b }
    }
    for (seed <- Seq(17L, 29L)) {
      val wg = wEdges(120, 30L, seed)
      def run(localMax: Long) =
        Graph.eccentricity(edgeDf(wg), "src", "dst", "w",
            localMaxEdges = localMax)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val got = run(Graph.LocalFixpointMaxEdges)
      val nodes = wg.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val want = nodes.map { s0 =>
        val d = refDijkstra(wg, s0).filter { case (v, _) => v != s0 }
        s0 -> (d.size.toLong, if (d.isEmpty) 0L else d.values.max)
      }.filter(_._2._1 > 0L).toMap
      assert(got == want, s"seed $seed: got $got want $want")
      assert(run(0L) == got, s"seed $seed: path parity")
    }
  }

  test("q_graph_eccentricity: trade-graph worst-routes are sane and center-first") {
    val rows = Queries.all.toMap.apply("q_graph_eccentricity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val es = rows.map(_.getDouble(2))
    assert(es.forall(_ > 0.0))
    assert(es.sameElements(es.sorted), "center (min ecc) must sort first")
    // radius <= diameter, both attained
    assert(es.head <= es.last)
  }

  test("q_graph_betweenness_weighted: trade-graph centralities are sane and ordered") {
    val rows = Queries.all.toMap.apply("q_graph_betweenness_weighted")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val bs = rows.map(_.getDouble(1))
    assert(bs.forall(_ >= 0.0))
    assert(bs.sameElements(bs.sorted(Ordering[Double].reverse)))
  }

  test("landmark registry ids: trade-graph estimates are sane and ordered") {
    val qb = Queries.all.toMap.apply("q_graph_betweenness_landmark")(spark, sfDir)
      .collect()
    assert(qb.nonEmpty && qb.length <= 25)
    val bs = qb.map(_.getDouble(1))
    assert(bs.forall(_ >= 0.0))
    assert(bs.sameElements(bs.sorted(Ordering[Double].reverse)))
    val qc = Queries.all.toMap.apply("q_graph_closeness_landmark")(spark, sfDir)
      .collect()
    assert(qc.nonEmpty && qc.length <= 25)
    assert(qc.map(_.getLong(1)).forall(n => n >= 0L && n <= 12L))
    val cs = qc.map(_.getDouble(2))
    assert(cs.forall(_ >= 0.0))
    assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
  }

  /** Reference peeling (Batagelj–Zaveršnik): repeatedly strip a
    * minimum-degree node; core(v) = the running max of the min degree
    * at the moment v is removed. Tie order does not change core
    * numbers — the independent check for [[Graph.coreness]]'s h-index
    * fixpoint. */
  private def refCoreness(edges: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val simple = edges.collect { case (a, b, _) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val adj = scala.collection.mutable
      .HashMap.empty[Long, scala.collection.mutable.Set[Long]]
    simple.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.HashMap.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val (v, ns) = adj.minBy { case (n0, s0) => (s0.size, n0) }
      k = math.max(k, ns.size.toLong)
      core(v) = k
      ns.foreach(u => adj(u) -= v)
      adj.remove(v)
    }
    core.toMap
  }

  test("coreness matches the peeling reference (K4 + triangle + chain)") {
    // K4 {1,2,3,4} (core 3) bridged to triangle {5,6,7} (core 2) by a
    // chain node 10 (degree 2 → core 2: the 2-core needs min-degree ≥ 2
    // in the subgraph, not a cycle), pendant 11 off node 1, island 8-9,
    // plus self-loop/parallel/reverse noise the undirect must absorb
    val kg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0),
        (2L, 4L, 1.0), (3L, 4L, 1.0), (5L, 6L, 1.0), (6L, 7L, 1.0),
        (7L, 5L, 1.0), (4L, 10L, 1.0), (10L, 5L, 1.0), (1L, 11L, 1.0),
        (8L, 9L, 1.0), (2L, 2L, 5.0), (3L, 2L, 9.0), (4L, 1L, 2.0))
    val got = Graph.coreness(edgeDf(kg), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refCoreness(kg)
    assert(got == want, s"got $got want $want")
    assert(got(1L) == 3L && got(6L) == 2L && got(10L) == 2L &&
      got(11L) == 1L && got(8L) == 1L)
  }

  test("coreness: single-task fixpoint == distributed loop") {
    val kg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0),
        (2L, 4L, 1.0), (3L, 4L, 1.0), (5L, 6L, 1.0), (6L, 7L, 1.0),
        (7L, 5L, 1.0), (4L, 10L, 1.0), (10L, 5L, 1.0), (1L, 11L, 1.0))
    val local = Graph.coreness(edgeDf(kg), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.coreness(edgeDf(kg), "src", "dst", "w",
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("coreness equals the peeling reference on 5k pseudorandom edges") {
    // deterministic LCG edges (no Math.random in specs), ~700 nodes
    val es = {
      var x = 42L
      def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
      (1 to 5000).map { _ =>
        val a = math.floorMod(nxt(), 700L); val b = math.floorMod(nxt(), 700L)
        (a, b, 1.0)
      }.filter { case (a, b, _) => a != b }
    }
    val local = Graph.coreness(edgeDf(es), "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refCoreness(es)
    assert(local == want)
  }

  test("q_graph_kcore: trade-graph core numbers are sane and ordered") {
    val rows = Queries.all.toMap.apply("q_graph_kcore")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val cores = rows.map(_.getLong(1))
    assert(cores.forall(c => c >= 1L && c <= 24L))
    // orderBy(desc(coreness), nation) contract
    assert(cores.sameElements(cores.sorted(Ordering[Long].reverse)))
  }

  test("modularity: hand-computed barbell golden; whole-graph community is exactly 0") {
    // two unit-weight triangles bridged once: W=700 cents, intra=600,
    // S_A = S_B = 700 → Q = (4·700·600 − 2·700²)/(4·700²) = 0.357143
    val s = spark
    import s.implicits._
    val barbell: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
        (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0), (3L, 4L, 1.0))
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "comm")
    val row = Graph.modularity(edgeDf(barbell), "src", "dst", "w",
      comm, "node", "comm").collect().head
    assert(row.getLong(0) == 2 && row.getLong(1) == 700L)
    assert(row.getDouble(2) == 0.357143, s"barbell Q: ${row.getDouble(2)}")
    // the trivial partition (everything one community): Q ≡ 0 exactly
    // (4W·W − (2W)² = 0 — an identity, not an approximation)
    val one = comm.select(col("node"), lit(0L).as("comm"))
    val r1 = Graph.modularity(edgeDf(barbell), "src", "dst", "w",
      one, "node", "comm").collect().head
    assert(r1.getLong(0) == 1 && r1.getDouble(2) == 0.0)
    // edgeless graph guards the 0/0 to 0.0
    val empty = edgeDf(Seq((1L, 1L, 5.0))) // only a self-loop → no edges
    val r0 = Graph.modularity(empty, "src", "dst", "w",
      comm, "node", "comm").collect().head
    assert(r0.getLong(0) == 0 && r0.getLong(1) == 0L && r0.getDouble(2) == 0.0)
  }

  test("q_graph_modularity: region partition score is sane at the unit fixture") {
    val row = Queries.all.toMap.apply("q_graph_modularity")(spark, sfDir)
      .collect().head
    assert(row.getLong(0) >= 1 && row.getLong(0) <= 5, "≤5 regions")
    assert(row.getDouble(1) > 0, "total trade weight positive")
    val q = row.getDouble(2)
    assert(q >= -0.5 && q <= 1.0, s"modularity bounds: $q")
  }

  /** Reference k-truss by synchronous peeling (the library's exact round
    * semantics): recount common-neighbor support over survivors, drop
    * everything below k−2 at once, repeat to fixpoint. */
  private def refKtruss(edges: Seq[(Long, Long, Double)],
                        k: Int): Map[(Long, Long), Long] = {
    var es = edges.collect { case (a, b, _) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    var sup = Map.empty[(Long, Long), Long]
    var changed = true
    while (changed) {
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      sup = es.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
      val next = es.filter(e => sup(e) >= k - 2)
      changed = next.size != es.size
      es = next
    }
    es.map(e => e -> sup(e)).toMap
  }

  test("ktruss: K4+pendant structural goldens across k; cascade peels to empty") {
    val kg: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0),
        (2L, 4L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0),
        (2L, 2L, 9.0), (2L, 1L, 1.0), (1L, 2L, 5.0)) // + noise
    def run(k: Int) = Graph.ktruss(edgeDf(kg), "src", "dst", "w", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // k=3: the pendant edge (support 0) peels, K4 survives at support 2
    val t3 = run(3)
    assert(t3.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(t3.values.forall(_ == 2L))
    // k=4: K4 is exactly the 4-truss
    assert(run(4) == t3)
    // k=5: nothing has support 3 — empty result
    assert(run(5).isEmpty)
    // cascade: two triangles sharing edge (2,3) — at k=4 the outer
    // edges peel in round 1, which starves (2,3) in round 2 → empty
    val chain: Seq[(Long, Long, Double)] =
      Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0),
        (2L, 4L, 1.0), (3L, 4L, 1.0))
    val tc = Graph.ktruss(edgeDf(chain), "src", "dst", "w", k = 4)
    assert(tc.collect().isEmpty, "cascading peel must reach the empty fixpoint")
  }

  test("ktruss matches the peeling reference on random graphs (both paths)") {
    // splitmix64-mixed endpoints: a RAW-LCG pair draw is triangle-free
    // by construction (consecutive outputs are affinely related mod the
    // node count), which would make this test vacuous — the finalizer
    // breaks that correlation
    def mixEdges(n: Int, nodes: Long, seed: Long): Seq[(Long, Long, Double)] = {
      def mix(z0: Long): Long = {
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      (0 until n).map { i =>
        (math.floorMod(mix(seed + 2L * i), nodes),
          math.floorMod(mix(seed + 2L * i + 1), nodes), 1.0)
      }.filter { case (a, b, _) => a != b }
    }
    val big = mixEdges(2000, 120L, 42L) // dense enough for a rich 5-truss
    val gotBig = Graph.ktruss(edgeDf(big), "src", "dst", "w", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotBig == refKtruss(big, 5))
    assert(gotBig.nonEmpty, "fixture graph should retain a 5-truss")
    // distributed path forced; fixpoint is the unique maximal subgraph,
    // so parity with the one-task path is exact
    val small = mixEdges(300, 40L, 7L)
    val gotDist = Graph.ktruss(edgeDf(small), "src", "dst", "w", k = 4,
        localMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotDist == refKtruss(small, 4))
    val gotLocal = Graph.ktruss(edgeDf(small), "src", "dst", "w", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotDist == gotLocal)
  }

  test("q_graph_ktruss: strong-trade 4-truss is sane at the unit fixture") {
    val rows = Queries.all.toMap.apply("q_graph_ktruss")(spark, sfDir).collect()
    assert(rows.nonEmpty, "the fixture's strong trade graph holds a 4-truss")
    assert(rows.forall(_.getLong(2) >= 2L), "every survivor has support ≥ k−2")
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length, "simple edges, no duplicates")
    assert(pairs.forall { case (a, b) => a != b })
  }

  test("q_graph_degree: out-mass equals in-mass over the closed graph") {
    val df = Queries.all.toMap.apply("q_graph_degree")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 25, "left join onto the full nation dim")
    val outW = rows.map(_.getDouble(1)).sum
    val inW = rows.map(_.getDouble(3)).sum
    assert(math.abs(outW - inW) < 1e-6,
      s"every edge leaves one nation and enters one: $outW vs $inW")
    assert(rows.map(_.getLong(2)).sum == rows.map(_.getLong(4)).sum)
  }
}
