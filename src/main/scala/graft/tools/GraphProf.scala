package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level breakdown of the iterative graph ids (edge
  * build vs node count vs per-round loop cost) plus the partition
  * counts of the iterated state — the round-9 verdict asks whether the
  * per-round shuffles are data-sized or config-sized. */
object GraphProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Queries.q_agg_groupby(spark, sfDir).count()

    val e0 = time("edges: build+checkpoint") {
      val e = graft.Queries.nationTradeEdges(spark, sfDir)
        .localCheckpoint(eager = true)
      e
    }
    println(s"[gprof] edge partitions = ${e0.rdd.getNumPartitions}, rows = ${e0.count()}")

    time("pagerank loop (whole op)") {
      graft.operators.Graph.pagerank(e0, "src", "dst", "wc")
        .queryExecution.toRdd.count()
    }
    time("labelProp loop (whole op)") {
      graft.operators.Graph.labelPropagation(e0, "src", "dst", "wc")
        .queryExecution.toRdd.count()
    }
    time("sssp loop (whole op)") {
      graft.operators.Graph.shortestPaths(e0, "src", "dst", "wc", 0L)
        .queryExecution.toRdd.count()
    }
    // second runs (warm broadcast/codegen caches)
    time("pagerank loop (2nd)") {
      graft.operators.Graph.pagerank(e0, "src", "dst", "wc")
        .queryExecution.toRdd.count()
    }
    time("labelProp loop (2nd)") {
      graft.operators.Graph.labelPropagation(e0, "src", "dst", "wc")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
