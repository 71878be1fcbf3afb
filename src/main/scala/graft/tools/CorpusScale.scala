package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the COMPOSED corpus-build lifecycle
  * ([[graft.operators.CorpusBuild.buildCorpus]]): runs the full
  * raw → exact-dedup → near-dup → [winnow →] decontaminate → mix →
  * sorted-shards pipeline over the `documents` fixture at `sfDir`,
  * with the probe (benchmark) set = every 101st doc — a realistic
  * eval-leak scenario: the benchmark docs live in the corpus and must
  * leave it. Prints ONE JSON line with the wall-clock and the
  * per-stage row ledger (the evidence for BASELINE.md's composed-cost
  * row). Usage: runMain graft.tools.CorpusScale [sfDir] [winnow|spans]
  * [nearDupThreshold] — the threshold arg exists for the spans probe:
  * at the default 0.7 the doc-level stages absorb ALL of the fixture's
  * exact 8-token duplication (family-shaped near-dups), so the span
  * stage's work only becomes visible when whole-doc dedup is looser. */
object CorpusScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val withWinnow = args.length > 1 && args.contains("winnow")
    val withSpans = args.length > 1 && args.contains("spans")
    val threshold = args.find(a => a.nonEmpty && (a(0).isDigit || a(0) == '.'))
      .map(_.toDouble).getOrElse(0.7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val probe = docs.filter(col("doc_id") % 101 === 0)
    val base = java.nio.file.Files.createTempDirectory("corpus_scale_")
      .toString
    val rates = Map("src0" -> 0.25, "src1" -> 0.5) // downweight two domains
    val t0 = System.nanoTime()
    val ledger = graft.operators.CorpusBuild.buildCorpus(
      docs, probe, "doc_id", "text", "source", "n_chars",
      s"$base/fp", s"$base/band", s"$base/shards",
      nearDupThreshold = threshold, mixRates = rates, defaultMixRate = 1.0,
      numShards = 8,
      winnowIndexDir = if (withWinnow) Some(s"$base/winnow") else None,
      spanRemovalWindowLen = if (withSpans) Some(8) else None)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"corpus_build","sf_dir":"$sfDir","cpus":$cpus,"winnow":$withWinnow,"spans":$withSpans,"near_dup_threshold":$threshold,"build_sec":${math.round(sec * 10) / 10.0},"raw":${ledger.raw},"after_exact":${ledger.afterExactDedup},"after_near_dup":${ledger.afterNearDup},"after_winnow":${ledger.afterWinnow},"after_span_removal":${ledger.afterSpanRemoval},"span_tokens_removed":${ledger.spanTokensRemoved},"after_decontaminate":${ledger.afterDecontaminate},"after_mix":${ledger.afterMix}}""")
    spark.stop()
  }
}
