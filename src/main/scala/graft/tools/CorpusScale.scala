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
  * row). Usage: runMain graft.tools.CorpusScale [sfDir]
  * [winnow|spans|quality|diversity-stage] [nearDupThreshold] —
  * `diversity-stage` turns on the semantic bucket cap (cap 8 over the
  * fixture's embeddings, vec_id ↔ doc_id) and the threshold arg
  * exists for the spans probe:
  * at the default 0.7 the doc-level stages absorb ALL of the fixture's
  * exact 8-token duplication (family-shaped near-dups), so the span
  * stage's work only becomes visible when whole-doc dedup is looser. */
object CorpusScale {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("pack")) { packProbe(args.drop(1)); return }
    if (args.headOption.contains("synth")) { synthProbe(args.drop(1)); return }
    if (args.headOption.contains("order")) { orderProbe(args.drop(1)); return }
    if (args.headOption.contains("dsir")) { dsirProbe(args.drop(1)); return }
    if (args.headOption.contains("diversity")) {
      diversityProbe(args.drop(1)); return
    }
    if (args.headOption.contains("spectral")) {
      spectralProbe(args.drop(1)); return
    }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val withWinnow = args.length > 1 && args.contains("winnow")
    val withSpans = args.length > 1 && args.contains("spans")
    val withQuality = args.length > 1 && args.contains("quality")
    val withDiversity = args.length > 1 && args.contains("diversity-stage")
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
    // quality mode: LM trained on the fixture's own en slice (the
    // q_dsir_hashed target). The fixture's languages share one
    // synthetic vocabulary, so every per-token weight sits slightly
    // negative (smoothing drift at tot_t ~= 0.2 tot_r); the probe cuts
    // at the measured sf0.1 median (-20.82e9 pico/token) to
    // demonstrate a meaningful keep-the-target-like-half selection
    val qualityLm =
      if (withQuality)
        Some(graft.operators.Sampling.dsirLm(docs, "text",
          col("lang") === "en").localCheckpoint(true))
      else None
    val qualityThreshold = -20820000000L
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
      spanRemovalWindowLen = if (withSpans) Some(8) else None,
      qualityLm = qualityLm, qualityThresholdPico = qualityThreshold,
      diversityEmb =
        if (withDiversity)
          Some(graft.sources.Tables.embeddings(spark, sfDir)
            .select(col("vec_id").as("doc_id"), col("embedding")))
        else None,
      diversityCap = 8)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"corpus_build","sf_dir":"$sfDir","cpus":$cpus,"winnow":$withWinnow,"spans":$withSpans,"quality":$withQuality,"diversity":$withDiversity,"near_dup_threshold":$threshold,"build_sec":${math.round(sec * 10) / 10.0},"raw":${ledger.raw},"after_exact":${ledger.afterExactDedup},"after_near_dup":${ledger.afterNearDup},"after_winnow":${ledger.afterWinnow},"after_span_removal":${ledger.afterSpanRemoval},"span_tokens_removed":${ledger.spanTokensRemoved},"after_decontaminate":${ledger.afterDecontaminate},"after_quality":${ledger.afterQuality},"after_diversity":${ledger.afterDiversity},"after_mix":${ledger.afterMix}}""")
    spark.stop()
  }

  private def synthSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 10M-doc single-JVM probes pin several corpus-scale stage
      // relations at once; a full-heap GC stall past the default 10s×60
      // heartbeat budget makes the in-process executor EXIT and the
      // context shut down (measured: the first 10M run died exactly
      // this way at minute 25). A real cluster spreads this state over
      // executors; for the one-JVM measurement rig the honest fix is a
      // wider stall tolerance, not a smaller corpus.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1800s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Deterministic synthetic corpus for the pack/dsir probes: doc i has
    * 20 + (i mod 120) LCG-picked words from a 5k vocabulary (mean ≈ 79.5
    * tokens/doc — the documents fixture's scale), lang cycling over 5
    * values so the dsir target slice is ~20% of tokens. */
  private def synthDocs(spark: SparkSession, nDocs: Long)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(nDocs).mapPartitions { it =>
      val langs = Array("en", "de", "fr", "es", "zh")
      it.map { id =>
        var x = id * 6364136223846793005L + 1442695040888963407L
        def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
        val n = 20 + (id % 120L).toInt
        val sb = new StringBuilder
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(' ')
          sb.append('w').append(math.floorMod(nxt(), 5000L))
          i += 1
        }
        (id, langs((id % 5L).toInt), sb.toString)
      }
    }.toDF("doc_id", "lang", "text")
  }

  /** Measures the q_sequence_pack plan at synthetic scale: ONE
    * scale-safe global prefix sum (`Analytics.globalRunningSum` — range
    * repartition + per-partition offsets, never a single-partition
    * window) over nDocs token counts, then the per-sequence census.
    * Usage: runMain graft.tools.CorpusScale pack [nDocs] */
  private def packProbe(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = synthSession()
    val docs = synthDocs(spark, nDocs).localCheckpoint(true) // exclude gen cost
    val t0 = System.nanoTime()
    val toks = docs.select(col("doc_id"),
      graft.functions.Text.tokenCount(col("text")).as("n_toks"))
    val cum = graft.operators.Analytics.globalRunningSum(
      toks, Seq(col("doc_id")), "n_toks", "cum")
    val total = cum.agg(max("cum").as("total"))
    val census = cum.filter(col("n_toks") > 0)
      .select(col("doc_id"),
        expr("(cum - n_toks) div 512").as("first_c"),
        expr("(cum - 1) div 512").as("last_c"))
      .select(col("first_c"),
        explode(sequence(col("first_c"), col("last_c"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_c") === col("seq_id"), 1L).otherwise(0L))
          .as("n_starts"))
      .crossJoin(broadcast(total))
    val agg = census.agg(count(lit(1)).as("n_seqs"),
      sum("n_docs").as("overlap_rows"), max("total").as("n_tokens"))
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"sequence_pack","n_docs":$nDocs,"n_tokens":${agg.getLong(2)},"n_seqs":${agg.getLong(0)},"overlap_rows":${agg.getLong(1)},"pack_sec":${math.round(sec * 10) / 10.0}}""")
    spark.stop()
  }

  /** Measures the diversity-cap family at synthetic scale (VERDICT r15
    * #5 — the one r15 family without a BASELINE.md scale row): nVecs
    * 64-dim vectors drawn around 40 LCG cluster centers with ±0.05
    * jitter (a skewed semantic landscape — most of a cluster shares an
    * LSH bucket, so the cap has real work), then (a) the
    * `q_bucket_entropy` census pass and (b) the
    * `Sampling.diversityCapRanked` selection pass (the composed-build /
    * live-gate machinery). Reports the bucket histogram extremes, the
    * cap selectivity, and both wall-times — the numbers behind the
    * "O(cap) state per bucket" claim.
    * Usage: runMain graft.tools.CorpusScale diversity [nVecs] [cap] */
  private def diversityProbe(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toLong else 1000000L
    val cap = if (args.length > 1) args(1).toInt else 8
    val spark = synthSession()
    val vecs = synthVecs(spark, nVecs) // checkpointed — gen cost excluded
    val t0 = System.nanoTime()
    val census = vecs
      .select(graft.operators.Sampling.diversityBucket(col("embedding"))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_b"))
      .agg(count(lit(1)).as("n_buckets"), max("n_b").as("max_bucket"),
        min("n_b").as("min_bucket"))
      .collect().head
    val censusSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val kept = graft.operators.Sampling
      .diversityCapRanked(vecs, "vec_id", "embedding", cap)
      .count()
    val rankSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"metric":"diversity_cap","n_vecs":$nVecs,"cap":$cap,"n_buckets":${census.getLong(0)},"max_bucket":${census.getLong(1)},"min_bucket":${census.getLong(2)},"kept":$kept,"census_sec":${math.round(censusSec * 10) / 10.0},"rank_sec":${math.round(rankSec * 10) / 10.0}}""")
    spark.stop()
  }

  /** nVecs 64-dim vectors around 40 LCG cluster centers with ±0.05
    * jitter (the diversityProbe landscape), checkpointed so probes
    * measure their own pass, not generation. */
  private def synthVecs(spark: SparkSession, nVecs: Long)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(nVecs).mapPartitions { it =>
      it.map { id =>
        var x = id * 6364136223846793005L + 1442695040888963407L
        def nxt(): Long = {
          x = x * 6364136223846793005L + 1442695040888963407L; x
        }
        val cluster = (id % 40L) * 2654435761L // decorrelate center seeds
        var c = cluster
        def cnxt(): Long = {
          c = c * 6364136223846793005L + 1442695040888963407L; c
        }
        val emb = Array.tabulate(64) { _ =>
          val center = (math.floorMod(cnxt(), 2000L) - 1000L) / 1000.0
          val jitter = (math.floorMod(nxt(), 2000L) - 1000L) / 20000.0
          center + jitter
        }.toSeq
        (id, emb)
      }
    }.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  /** Measures the q_embed_pca / q_embed_project plans at synthetic
    * scale: the one-pass MomentAgg fold (the d² per-row JVM loop is the
    * whole data-side cost; shuffle = one 4,162-long array per
    * partition) + the driver eigensolve, then the full q_embed_project
    * lifecycle (its own moment pass + the literal-array projection
    * scan). The clustered landscape has a real dominant axis, so
    * ev_permille reads high — the probe asserts the direction is
    * non-degenerate, not just fast.
    * Usage: runMain graft.tools.CorpusScale spectral [nVecs] */
  private def spectralProbe(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = synthSession()
    val vecs = synthVecs(spark, nVecs)
    val t0 = System.nanoTime()
    val pca = graft.operators.Spectral.pc1(vecs, "embedding").collect()
    val pcaSec = (System.nanoTime() - t0) / 1e9
    val ev = pca.head.getLong(2)
    val t1 = System.nanoTime()
    val hist = graft.operators.Spectral.pc1Projection(vecs, "embedding")
      .collect()
    val projSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"metric":"spectral","n_vecs":$nVecs,"dim":64,"ev_permille":$ev,"n_buckets":${hist.length},"pca_sec":${math.round(pcaSec * 10) / 10.0},"project_sec":${math.round(projSec * 10) / 10.0},"pca_vecs_per_sec":${math.round(nVecs / pcaSec)}}""")
    spark.stop()
  }

  /** Measures the q_dsir_hashed plan at synthetic scale: two data
    * passes (hashed-bucket LM counts; per-doc integer fold against the
    * broadcast 4096-row LM), target = lang 'en' (~20% of tokens).
    * Usage: runMain graft.tools.CorpusScale dsir [nDocs] */
  private def dsirProbe(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = synthSession()
    val docs = synthDocs(spark, nDocs).localCheckpoint(true)
    val t0 = System.nanoTime()
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .withColumn("b", pmod(
        graft.operators.Dedup.portableHash64(concat(lit("dsir:"), col("w"))),
        lit(4096L)))
      .localCheckpoint(true)
    val raw = tok.groupBy("b").agg(count(lit(1)).as("n_r"))
    val tgt = tok.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("n_t"))
    val lm = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("n_t"))
      .crossJoin(broadcast(raw.agg(sum("n_r").as("tot_r"))))
      .crossJoin(broadcast(tgt.agg(sum("n_t").as("tot_t"))))
      .select(col("b"),
        floor((log((col("n_t") + 1).cast("double") / (col("tot_t") + 4096)) -
          log((col("n_r") + 1).cast("double") / (col("tot_r") + 4096))) *
          lit(1e12)).cast("long").as("ratio_pico"))
    val w = tok.join(broadcast(lm), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("ratio_pico").as("weight_pico"))
    val agg = w.agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_toks"))
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"dsir_hashed","n_docs":${agg.getLong(0)},"n_tokens":${agg.getLong(1)},"dsir_sec":${math.round(sec * 10) / 10.0}}""")
    spark.stop()
  }

  /** Cluster-structured synthetic corpus for the composed-build scale
    * probes — REAL pressure for every stage: each 4-doc cluster is 1
    * base + 1 EXACT copy (exact-dedup work) + 2 near-identical variants
    * (2 of 40 positions rewritten — exact Jaccard ≈ 0.81, the near-dup
    * stage's work); every 53rd doc instead LIFTS the first 20 tokens of
    * its cluster base into fresh content (Jaccard ≈ 0.3 — slips the
    * near-dup bar, the winnow stage's work; its lifted run is also the
    * span stage's work when winnow is off); 5 languages (the DSIR
    * target marker), 4 source strata (the mix stage), and a 64-dim
    * embedding pooled into 1024 jittered cluster regions (the diversity
    * stage). All LCG-deterministic — two runs see the same corpus. */
  private def synthCorpus(spark: SparkSession, nDocs: Long)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(nDocs).mapPartitions { it =>
      val langs = Array("en", "de", "fr", "es", "zh")
      it.map { id =>
        val cluster = id / 4L
        val variant = id % 4L
        var x = cluster * 6364136223846793005L + 1442695040888963407L
        def nxt(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
        val words = Array.tabulate(40)(_ => s"w${math.floorMod(nxt(), 200000L)}")
        val text =
          if (id % 53L == 0L && variant != 0L) {
            // the winnow extract-of shape: 20 lifted + 20 fresh tokens
            var y = id * 2862933555777941757L + 3037000493L
            def fresh(): Long = { y = y * 2862933555777941757L + 3037000493L; y }
            (words.take(20) ++
              Array.tabulate(20)(_ => s"f${math.floorMod(fresh(), 200000L)}"))
              .mkString(" ")
          } else if (variant >= 2L) { // near-dup: 2 positions rewritten
            val w = words.clone()
            w(math.floorMod(variant * 7L, 40L).toInt) = s"m${id}a"
            w(math.floorMod(variant * 13L + 3L, 40L).toInt) = s"m${id}b"
            w.mkString(" ")
          } else words.mkString(" ") // variant 1 = exact copy of base
        val region = cluster % 1024L
        val emb = Array.tabulate(64) { j =>
          var h = region * 31L + j * 2654435761L
          h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
          (math.floorMod(h, 2000L).toDouble - 1000.0) / 1000.0 +
            (math.floorMod(id, 97L).toDouble - 48.0) / 4800.0
        }
        (id, langs((cluster % 5L).toInt), s"src${id % 4L}", text, emb)
      }
    }.toDF("doc_id", "lang", "source", "text", "embedding")
      .withColumn("n_chars", length(col("text")))
  }

  /** 10M-doc composed-build measurement (VERDICT r16 #3): `runMain
    * graft.tools.CorpusScale synth [nDocs] [cap]` — the FULL
    * buildCorpus lifecycle with EVERY optional stage on (winnow, span
    * removal, DSIR quality, diversity cap) over the cluster-structured
    * synthetic corpus, probe = every 101st doc. Reports total wall, the
    * LM-training prep wall, and the per-stage selectivity ledger — the
    * BASELINE.md composed-cost row at a scale where stage order
    * matters (the [[orderProbe]] companion measures the order claim
    * itself). Diversity cap defaults to nDocs/512: the 2^8-bucket LSH
    * geometry is coarse at 10M, so a fixed small cap would measure an
    * unrealistic 99%% drop instead of the stage's real cost. */
  private def synthProbe(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cap = if (args.length > 1) args(1).toInt
      else math.max(8L, nDocs / 512L).toInt
    val spark = synthSession()
    // DISK_ONLY pin: the 10M input corpus must not occupy unified
    // storage memory the build's own stage checkpoints need — on disk
    // it costs re-read IO per consumer, not heap (the same choice a
    // real cluster makes for an over-RAM input)
    val docs = synthCorpus(spark, nDocs)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count() // materialize the pin before the clock starts
    val probe = docs.filter(col("doc_id") % 101 === 0)
      .select("doc_id", "text")
    val tLm = System.nanoTime()
    val lm = graft.operators.Sampling
      .dsirLm(docs, "text", col("lang") === "en")
      .localCheckpoint(true)
    val lmSec = (System.nanoTime() - tLm) / 1e9
    val base = java.nio.file.Files.createTempDirectory("corpus_synth_")
      .toString
    val t0 = System.nanoTime()
    val ledger = graft.operators.CorpusBuild.buildCorpus(
      docs, probe, "doc_id", "text", "source", "n_chars",
      s"$base/fp", s"$base/band", s"$base/shards",
      nearDupThreshold = 0.7,
      mixRates = Map("src0" -> 0.5), defaultMixRate = 1.0,
      numShards = 32,
      winnowIndexDir = Some(s"$base/winnow"),
      spanRemovalWindowLen = Some(8),
      qualityLm = Some(lm), qualityThresholdPico = -20820000000L,
      diversityEmb = Some(docs.select("doc_id", "embedding")),
      diversityCap = cap,
      diversityIndexDir = Some(s"$base/div"))
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"corpus_build_synth","n_docs":$nDocs,"cpus":${spark.sparkContext.defaultParallelism},"diversity_cap":$cap,"lm_train_sec":${math.round(lmSec * 10) / 10.0},"build_sec":${math.round(sec * 10) / 10.0},"raw":${ledger.raw},"after_exact":${ledger.afterExactDedup},"after_near_dup":${ledger.afterNearDup},"after_winnow":${ledger.afterWinnow},"after_span_removal":${ledger.afterSpanRemoval},"span_tokens_removed":${ledger.spanTokensRemoved},"after_quality":${ledger.afterQuality},"after_diversity":${ledger.afterDiversity},"after_decontaminate":${ledger.afterDecontaminate},"after_mix":${ledger.afterMix}}""")
    spark.stop()
  }

  /** Stage-ORDER experiment (VERDICT r16 #3's second half): is
    * exact-dedup-first measurably right? `runMain graft.tools.
    * CorpusScale order [nDocs]` times the near-dup stage (the most
    * expensive dedup pass — shingle/minhash every doc) two ways over
    * the SAME corpus: EXPENSIVE-FIRST (near-dup over the raw corpus)
    * vs CHEAP-FIRST (one hash-agg exact pass, then near-dup over its
    * survivors — the buildCorpus order). The exact stage costs one
    * md5 shuffle and removes ~25%% of rows before the ~40-hash/doc
    * minhash work; the ratio is the claim's evidence. */
  private def orderProbe(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = synthSession()
    val docs = synthCorpus(spark, nDocs)
      .select("doc_id", "text").localCheckpoint(true)
    // EXPENSIVE-FIRST: minhash everything, exact copies included
    val tA = System.nanoTime()
    val nA = graft.operators.Dedup
      .clusterByMinhash(docs, "doc_id", "text", 0.7).count()
    val secA = (System.nanoTime() - tA) / 1e9
    // CHEAP-FIRST (the buildCorpus order): one exact hash-agg pass,
    // near-dup rides the survivors
    val tB = System.nanoTime()
    val keepers = docs
      .groupBy(graft.functions.Text.fingerprint(col("text")).as("__fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exact = docs.join(keepers.select("doc_id"), Seq("doc_id"),
      "left_semi").localCheckpoint(true)
    val nExact = exact.count()
    val nB = graft.operators.Dedup
      .clusterByMinhash(exact, "doc_id", "text", 0.7).count()
    val secB = (System.nanoTime() - tB) / 1e9
    println(s"""{"metric":"corpus_stage_order","n_docs":$nDocs,"expensive_first_sec":${math.round(secA * 10) / 10.0},"cheap_first_sec":${math.round(secB * 10) / 10.0},"speedup":${math.round(secA / secB * 100) / 100.0},"after_exact":$nExact,"survivors_a":$nA,"survivors_b":$nB}""")
    spark.stop()
  }
}
