package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only incremental-components scale probe: MEASURES the bucketed
  * store's batch-proportional claim. Seeds a large labeling (`nNodes`
  * nodes as 2-node components), then folds a small edge batch in two
  * ways: (a) the BUCKETED store (`mergeIntoComponentsStore` — touched
  * label-buckets only) and (b) the flat snapshot (componentsMerge +
  * full overwrite — what the streaming sink's swap does each batch).
  * Prints ONE JSON line with wall seconds and bytes written by each
  * path, plus the touched-bucket count. Usage:
  * runMain graft.tools.ComponentsScale [nNodes] [batchEdges] [buckets]
  */
object ComponentsScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nNodes = if (args.nonEmpty) args(0).toLong else 1000000L
    // steady-state trickle shape: the batch must touch FEW components
    // relative to the bucket count for the partial rewrite to win —
    // that is the contract (a batch touching every bucket degenerates
    // to the flat rewrite, plus bookkeeping)
    val batchEdges = if (args.length > 1) args(1).toInt else 20
    val buckets = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // labeling: node 2i pairs with 2i+1 -> label 2i (no CC run needed
    // to seed; the labeling IS the ground truth by construction)
    val labels = spark.range(nNodes).select(col("id"),
        (col("id") - pmod(col("id"), lit(2L))).as("label"))
      .localCheckpoint(true)
    // batch: link component 2k to component 2k+nNodes/2 (merges two
    // existing components per edge, all distinct)
    var x = 9L
    def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    require(nNodes % 4 == 0, "nNodes must be divisible by 4")
    val half = nNodes / 2
    val batch = (1 to batchEdges).map { _ =>
      val a = math.floorMod(nxt(), half / 2) * 2
      (a, a + half) // merges two existing 2-node components
    }.distinct.toDF("id_a", "id_b").localCheckpoint(true)

    def dirBytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).toSeq.flatten.map(walk).sum
      walk(new java.io.File(d))
    }

    // (a) bucketed store: touched-buckets-only rewrite
    val bDir = java.nio.file.Files.createTempDirectory("cc_b_").toString + "/labels"
    graft.operators.Dedup.writeComponentsStore(labels, bDir, buckets)
    val bytesBefore = dirBytes(bDir)
    val ta = System.nanoTime()
    val touched = graft.operators.Dedup
      .mergeIntoComponentsStore(batch, bDir, buckets = buckets)
    val bucketedSec = (System.nanoTime() - ta) / 1e9
    // rewrite volume = the touched partitions' post-merge bytes (each
    // was fully replaced); untouched partitions carried zero writes
    val bucketedRewriteBytes = touched
      .map(b => dirBytes(s"$bDir/__bucket=$b")).sum

    // (b) flat snapshot: merge + full rewrite (the swap-sink shape)
    val fDir = java.nio.file.Files.createTempDirectory("cc_f_").toString + "/labels"
    labels.write.mode("overwrite").parquet(fDir)
    val tb = System.nanoTime()
    val merged = graft.operators.Dedup.componentsMerge(
      spark.read.parquet(fDir), batch).localCheckpoint(true)
    merged.write.mode("overwrite").parquet(fDir + "_next")
    val flatSec = (System.nanoTime() - tb) / 1e9
    val flatBytes = dirBytes(fDir + "_next")

    println(s"""{"metric":"components_scale","nodes":$nNodes,"batch_edges":$batchEdges,"buckets":$buckets,"cpus":$cpus,"bucketed_sec":${math.round(bucketedSec * 10) / 10.0},"touched_buckets":${touched.size},"store_bytes":$bytesBefore,"bucketed_rewrite_bytes":$bucketedRewriteBytes,"flat_sec":${math.round(flatSec * 10) / 10.0},"flat_rewrite_bytes":$flatBytes}""")
    spark.stop()
  }
}
