package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only landmark-centrality scaling probe: MEASURES the 100 TB
  * claim behind `landmarkK` instead of arguing it. On a pseudorandom
  * graph far above the nation fixture (default 20k nodes / 120k
  * edges), exact all-sources betweenness is n² state (20k × 20k =
  * 400M (src, node) rows here — intractable long before 100 TB), while
  * the Brandes–Pich estimator sweeps K sources for K·n state. This
  * probe times the DISTRIBUTED path (the localMaxEdges=0 force — the
  * path a real cluster runs) at a ladder of K values and prints one
  * JSON line with per-K wall seconds and the OUTPUT node count
  * (`out_rows` = one row per node at every K — a sanity column, not
  * the K·n forward-state size; the state-∝-K evidence is the GraphSpec
  * forward-state probe), so BASELINE.md can record cost ∝ K with
  * numbers.
  * Usage: runMain graft.tools.CentralityScale [nodes] [edges] [k,k,k]
  */
object CentralityScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nNodes = if (args.nonEmpty) args(0).toLong else 20000L
    val nEdges = if (args.length > 1) args(1).toInt else 120000
    val ks = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
             else Seq(4, 8, 16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic LCG edge list (the GraphSpec generator, bigger)
    var x = 42L
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val edges = (1 to nEdges).map { _ =>
      (math.floorMod(nxt(), nNodes), math.floorMod(nxt(), nNodes), 1.0)
    }.filter { case (a, b, _) => a != b }
    val df = edges.toDF("src", "dst", "w").localCheckpoint(true)

    // preserve the input's checkpoint across runs; drop each run's own
    // leftover state afterwards (the Bench between-id hygiene)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    // untimed warmup: absorb JVM/codegen/shuffle-machinery init so the
    // smallest K doesn't pay it (the Bench warmup discipline)
    graft.operators.Graph.betweenness(df, "src", "dst", "w",
      landmarkK = Some(1), localMaxEdges = 0L).count()
    spark.sparkContext.getPersistentRDDs
      .filterNot(p => keep(p._1)).values
      .foreach(_.unpersist(blocking = false))
    val results = ks.map { k =>
      val t0 = System.nanoTime()
      val out = graft.operators.Graph.betweenness(df, "src", "dst", "w",
        landmarkK = Some(k), localMaxEdges = 0L)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot(p => keep(p._1)).values
        .foreach(_.unpersist(blocking = false))
      (k, sec, rows)
    }
    val json = results.map { case (k, sec, rows) =>
      s"""{"k":$k,"sec":${math.round(sec * 100) / 100.0},"out_rows":$rows}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"landmark_betweenness_scaling","nodes":$nNodes,"edges":${edges.size},"cpus":$cpus,"runs":$json}""")
    spark.stop()
  }
}
