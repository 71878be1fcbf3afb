package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only streaming throughput probe: rows/second through the DWS
  * signature pipeline (parse → watermark → tumbling window → keyed agg)
  * from the deterministic rate source. Prints one JSON line. The
  * reference's runtime envelope (Flink 1.17 single-node) publishes no
  * numbers; this records ours for the record. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("state")) { stateScale(args.drop(1)); return }
    if (args.headOption.contains("monitor")) { monitorScale(args.drop(1)); return }
    if (args.headOption.contains("duprate")) { dupRateScale(args.drop(1)); return }
    if (args.headOption.contains("dsirgate")) { dsirGateScale(args.drop(1)); return }
    if (args.headOption.contains("divgate")) { divGateScale(args.drop(1)); return }
    if (args.headOption.contains("chain")) { chainScale(args.drop(1)); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rate = if (args.nonEmpty) args(0).toInt else 500000
    val seconds = if (args.length > 1) args(1).toInt else 15
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
      // DWS shape: derive a key + value, watermark, window, aggregate
      .withColumn("user_id", col("value") % 1000)
      .withColumn("event_type",
        element_at(typedLit(Seq("click", "view", "purchase", "signup", "error")),
          (col("value") % 5 + 1).cast("int")))
      .withWatermark("timestamp", "2 seconds")
      .groupBy(window(col("timestamp"), "5 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
        approx_count_distinct(col("user_id")).as("n_users"))

    val q = stream.writeStream.format("noop").outputMode("update").start()
    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val processed = progress.map(p => p.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val rps = processed / wall
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.0f,"rows":$processed,"wall_sec":$wall%.1f,"offered_rate":$rate,"cpus":$cpus}""")
    spark.stop()
  }

  /** State-scale evidence mode (`runMain graft.tools.StreamBench state
    * <nKeys> [rate] [processor]`): drive a keyed `transformWithState`
    * processor ([[graft.streaming.Processors.FirstVisitProcessor]] or
    * `funnel`) to ≥ nKeys DISTINCT keys under the RocksDB provider —
    * every rate-source row is a fresh key, so the store grows one row
    * per input — then report keys/s plus the state-store metrics the
    * 100 TB stateful-claim rests on: rows in state, in-memory usage,
    * and the RocksDB file/snapshot footprint, all from the query's own
    * `StreamingQueryProgress.stateOperators`. One JSON line. */
  private def stateScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nKeys = if (args.nonEmpty) args(0).toLong else 1000000L
    val rate = if (args.length > 1) args(1).toInt else 500000
    val which = if (args.length > 2) args(2) else "firstVisit"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.Processors

    val ck = java.nio.file.Files.createTempDirectory("streambench_ck_").toString
    val rows = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
    val out = which match {
      case "funnel" =>
        rows.select(col("value").as("userId"), lit("view").as("etype"),
            col("value").as("tsMs"))
          .as[Processors.FunnelEvent]
          .groupByKey(_.userId)
          .transformWithState(
            new Processors.FunnelProcessor(Seq("view", "click", "purchase")),
            TimeMode.None(), OutputMode.Append())
      case _ =>
        rows.select(col("value").as("userId"),
            date_format(col("timestamp"), "yyyy-MM-dd").as("date"),
            col("value").as("tsMs"))
          .as[Processors.Visit]
          .groupByKey(_.userId)
          .transformWithState(new Processors.FirstVisitProcessor(),
            TimeMode.None(), OutputMode.Append())
    }
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", ck)
      .outputMode("append").start()
    val t0 = System.nanoTime()
    val deadline = System.currentTimeMillis + 10 * 60 * 1000
    var stateRows = 0L
    while (stateRows < nKeys && System.currentTimeMillis < deadline) {
      Thread.sleep(500)
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows = p.stateOperators(0).numRowsTotal
    }
    val p = q.lastProgress
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    val so = p.stateOperators(0)
    val custom = so.customMetrics
    def cm(k: String): Long =
      if (custom.containsKey(k)) custom.get(k).longValue() else -1L
    if (sys.env.contains("SPARK_GRAFT_DUMP_METRICS"))
      System.err.println("custom metrics: " + custom.keySet())
    println(f"""{"metric":"state_keys_per_sec","value":${stateRows / wall}%.0f,"processor":"$which","state_rows":$stateRows,"wall_sec":$wall%.1f,"memory_used_bytes":${so.memoryUsedBytes},"rocksdb_sst_bytes":${cm("rocksdbSstFileSize")},"rocksdb_pinned_mem_bytes":${cm("rocksdbPinnedBlocksMemoryUsage")},"snapshot_upload_bytes":${cm("rocksdbBytesCopied")},"cpus":$cpus}""")
    spark.stop()
  }

  /** Dup-rate-monitor throughput mode (`runMain graft.tools.StreamBench
    * duprate [docsPerSec] [seconds]`): docs/second through the FULL
    * duplication-rate-monitor path — rate source → synthesized 40-token
    * docs in families of 4 EXACT duplicates (~75%% arriving dup rate, a
    * dup-heavy crawl) → [[graft.streaming.Jobs.windowedFpCounts]] →
    * [[graft.sources.IO.dupRateAuditSink]] doing real per-batch work:
    * fp-index read + earliest-window fold + versioned store upsert +
    * first-seen delta append. The exact-copy sibling of the novelty
    * monitor's throughput row — expected to run FASTER per doc (one md5
    * per doc instead of ~38 gram hashes, and the index carries distinct
    * CONTENTS, not the gram universe). One JSON line. */
  private def dupRateScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rate = if (args.nonEmpty) args(0).toInt else 20000
    val seconds = if (args.length > 1) args(1).toInt else 30
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("duprate_bench_")
      .toString
    val toks = (0 until 40).map(i =>
      concat(lit("t"), ((col("value") / 4) * 40 + i) % 200000))
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
      .withColumn("text", concat_ws(" ", toks: _*))
    val hist = graft.streaming.Jobs.windowedFpCounts(
      docs, "timestamp", "text", "5 seconds", "2 seconds")
    val q = graft.sources.IO.dupRateAuditSink(hist,
        s"$base/fps", s"$base/store", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val processed = progress.map(_.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val idxRows =
      try spark.read.parquet(s"$base/fps").count() catch { case _: Exception => 0L }
    val versions = graft.sources.IO.snapshotVersions(spark, s"$base/store")
    println(f"""{"metric":"duprate_docs_per_sec","value":${processed / wall}%.0f,"docs":$processed,"wall_sec":$wall%.1f,"offered_rate":$rate,"index_fps":$idxRows,"store_versions":${versions.size},"cpus":$cpus}""")
    spark.stop()
  }

  /** Quality-gate throughput mode (`runMain graft.tools.StreamBench
    * dsirgate [docsPerSec] [seconds]`): docs/second through the FULL
    * live DSIR gate — rate source → synthesized 40-token docs (half
    * from the target vocabulary, half junk) →
    * [[graft.sources.IO.dsirGateSink]] doing real per-batch work: LM
    * re-read + broadcast score fold + audit append + admit append. The
    * per-doc cost model sits between the dup-rate monitor (1 md5/doc)
    * and the novelty monitor (~38 gram hashes/doc): 40 token hashes +
    * one broadcast join per doc. One JSON line. */
  private def dsirGateScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rate = if (args.nonEmpty) args(0).toInt else 20000
    val seconds = if (args.length > 1) args(1).toInt else 30
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dsirgate_bench_")
      .toString
    // train the LM batch-side: target = 'g' vocabulary, raw adds 'j'
    val corpus = (0 until 2000).map { i =>
      if (i % 2 == 0) (true, (0 until 40).map(k => s"g${(i * 40 + k) % 5000}").mkString(" "))
      else (false, (0 until 40).map(k => s"j${(i * 40 + k) % 5000}").mkString(" "))
    }.toDF("t", "text")
    graft.operators.Sampling.dsirLm(corpus, "text", col("t"))
      .write.parquet(s"$base/lm")
    // streamed docs alternate target-like and junk-like vocabularies
    val toks = (0 until 40).map(i => concat(
      when(col("value") % 2 === 0, lit("g")).otherwise(lit("j")),
      (col("value") * 40 + i) % 5000))
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
      .withColumn("doc_id", col("value"))
      .withColumn("text", concat_ws(" ", toks: _*))
      .select("doc_id", "text")
    val q = graft.sources.IO.dsirGateSink(docs, s"$base/lm",
        s"$base/clean", s"$base/audit", s"$base/ck", "doc_id", "text",
        thresholdPicoPerToken = 0L)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val processed = progress.map(_.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val admitted =
      try spark.read.parquet(s"$base/clean").count() catch { case _: Exception => 0L }
    val audited =
      try spark.read.parquet(s"$base/audit").count() catch { case _: Exception => 0L }
    println(f"""{"metric":"dsirgate_docs_per_sec","value":${processed / wall}%.0f,"docs":$processed,"wall_sec":$wall%.1f,"offered_rate":$rate,"admitted":$admitted,"audited":$audited,"cpus":$cpus}""")
    spark.stop()
  }

  /** Diversity-gate throughput mode (`runMain graft.tools.StreamBench
    * divgate [vecsPerSec] [seconds] [cap]`): vectors/second through the
    * FULL live diversity gate — rate source → synthesized 64-dim
    * embeddings clustered into 512 jittered regions (a realistic
    * pooled-crawl landscape: buckets fill and the cap starts binding
    * mid-run) → [[graft.sources.IO.diversityGateSink]] doing REAL work
    * per batch: codegen signature pass, bounded-heap per-bucket rank,
    * membership-index occupancy read, corpus + index appends. The
    * number an operator needs before putting the gate on a production
    * embedding ingest. One JSON line. */
  private def divGateScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rate = if (args.nonEmpty) args(0).toInt else 20000
    val seconds = if (args.length > 1) args(1).toInt else 30
    val cap = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("divgate_bench_")
      .toString
    // 512 cluster centers from the row id, ±1% jitter — vectors pool
    // into ~hundreds of LSH buckets so occupancy pressure is real
    val comps = (0 until 64).map { j =>
      (pmod(xxhash64(col("value") % 512L, lit(j)), lit(2000L))
        .cast("double") - 1000.0) / 1000.0 +
        ((col("value") % 97L).cast("double") - 48.0) / 4800.0
    }
    val vecs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
      .withColumn("vec_id", col("value"))
      .withColumn("embedding", array(comps: _*))
      .select("vec_id", "embedding")
    val q = graft.sources.IO.diversityGateSink(vecs, s"$base/idx",
        s"$base/out", s"$base/ck", "vec_id", "embedding", cap)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val processed = progress.map(_.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val admitted =
      try spark.read.parquet(s"$base/out").count() catch { case _: Exception => 0L }
    println(f"""{"metric":"divgate_vecs_per_sec","value":${processed / wall}%.0f,"vecs":$processed,"wall_sec":$wall%.1f,"offered_rate":$rate,"cap":$cap,"admitted":$admitted,"cpus":$cpus}""")
    spark.stop()
  }

  /** Monitor-throughput mode (`runMain graft.tools.StreamBench monitor
    * [docsPerSec] [seconds]`): docs/second through the FULL novelty-
    * monitor path — rate source → synthesized 40-token docs (families
    * of 4 duplicates, so ~25%% of gram mass is first-seen: a realistic
    * dup-heavy crawl) → [[graft.streaming.Jobs.windowedGramDocFreq]]
    * (watermarked per-window gram relation) →
    * [[graft.sources.IO.noveltyAuditSink]] doing REAL work per batch:
    * gram-index read + novelty fold + versioned store upsert +
    * first-seen delta append. The number an operator needs before
    * putting the monitor on a production ingest: what doc rate one
    * node sustains INCLUDING the index round-trips. One JSON line. */
  private def monitorScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rate = if (args.nonEmpty) args(0).toInt else 20000
    val seconds = if (args.length > 1) args(1).toInt else 30
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("monitor_bench_")
      .toString
    val toks = (0 until 40).map(i =>
      concat(lit("t"), ((col("value") / 4) * 40 + i) % 200000))
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate.toString)
      .option("numPartitions", cpus).load()
      .withColumn("text", concat_ws(" ", toks: _*))
    val hist = graft.streaming.Jobs.windowedGramDocFreq(
      docs, "timestamp", "text", "5 seconds", "2 seconds")
    val q = graft.sources.IO.noveltyAuditSink(hist,
        s"$base/grams", s"$base/store", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    q.stop()
    val processed = progress.map(_.numInputRows).sum
    val wall = (System.nanoTime() - t0) / 1e9
    val idxRows =
      try spark.read.parquet(s"$base/grams").count() catch { case _: Exception => 0L }
    val versions = graft.sources.IO.snapshotVersions(spark, s"$base/store")
    println(f"""{"metric":"monitor_docs_per_sec","value":${processed / wall}%.0f,"docs":$processed,"wall_sec":$wall%.1f,"offered_rate":$rate,"index_grams":$idxRows,"store_versions":${versions.size},"cpus":$cpus}""")
    spark.stop()
  }

  /** Composed ingest-chain throughput mode (`runMain
    * graft.tools.StreamBench chain [batchSize] [nBatches]`): documents/
    * second through the FULL composed live ingest chain
    * ([[graft.sources.IO.composedIngestSink]] — exact-dedup → near-dup
    * → winnow → decontaminate → quality → diversity, every artifact
    * advanced, WAL + ledger per batch). FIXED-size micro-batches via a
    * file stream with `maxFilesPerTrigger 1` — a rate-source run
    * measures backlog dynamics, not the chain (the first slow batch
    * swallows the backlog and every later batch inherits it); fixed
    * batches measure what an operator provisions for: per-batch wall at
    * a chosen batch size, across batches as the gate indexes GROW.
    * Synthetic workload with real gate pressure: 40-token docs with
    * ≈17% exact re-emissions, 64-dim embeddings pooled into 512
    * jittered semantic regions, a probe set and a DSIR LM trained on a
    * boot sample. One JSON line with total docs/s + first/last batch
    * wall. */
  private def chainScale(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val batchSize = if (args.nonEmpty) args(0).toLong else 20000L
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{ChainConfig, Sampling}
    val base = java.nio.file.Files.createTempDirectory("chain_bench_")
      .toString
    // deterministic synthetic corpus: ≈17% exact re-emissions (the
    // exact-dedup pressure), 40 tokens from a 200k-token vocabulary,
    // embeddings pooled into 512 jittered regions (the divGateScale
    // landscape). One parquet file per micro-batch.
    def gen(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("__ck",
        when(col("id") % 6L === 0L, col("id") / 7L)
          .otherwise(col("id")) % 524288L)
      .withColumn("doc_id", col("id"))
      .withColumn("text", concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"),
          pmod(xxhash64(col("__ck") * 40L + i), lit(200000L)))): _*))
      .withColumn("embedding", array((0 until 64).map { j =>
        (pmod(xxhash64(col("__ck") % 512L, lit(j)), lit(2000L))
          .cast("double") - 1000.0) / 1000.0 +
          ((col("__ck") % 97L).cast("double") - 48.0) / 4800.0
      }: _*))
      .select("doc_id", "text", "embedding")
    val probeDir = s"$base/probe"; val lmDir = s"$base/lm"
    val boot = gen(spark.range(2048).toDF("id"))
    boot.limit(32).select("text").write.parquet(probeDir)
    Sampling.dsirLm(boot.withColumn("__t", col("doc_id") % 2L === 0L),
      "text", col("__t")).write.parquet(lmDir)
    val inDir = s"$base/in"
    for (b <- 0 until nBatches)
      gen(spark.range(b * batchSize, (b + 1) * batchSize).toDF("id"))
        .coalesce(1).write.mode("append").parquet(inDir)
    val docs = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val cfg = ChainConfig("doc_id", "text",
      fpIndexDir = s"$base/fp", bandIndexDir = s"$base/band",
      nearDupThreshold = 0.7,
      winnowIndexDir = Some(s"$base/win"),
      probeDir = Some(probeDir),
      lmDir = Some(lmDir), qualityThresholdPicoPerToken = -10000000000000L,
      embCol = Some("embedding"),
      diversityIndexDir = Some(s"$base/div"),
      diversityCap = (batchSize * nBatches / 512L + 1L).toInt)
    val t0 = System.nanoTime()
    val q = graft.sources.IO.composedIngestSink(docs, s"$base/out",
        s"$base/ck", cfg)
      .start()
    q.awaitTermination() // AvailableNow: drains the nBatches files
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    val processed = progress.map(_.numInputRows).sum
    val perBatch = progress.map(_.batchDuration / 1e3)
    val admitted =
      try spark.read.parquet(s"$base/out").count()
      catch { case _: Exception => 0L }
    println(f"""{"metric":"chain_docs_per_sec","value":${processed / wall}%.0f,"docs":$processed,"wall_sec":$wall%.1f,"batch_size":$batchSize,"batches":${progress.length},"first_batch_sec":${perBatch.headOption.getOrElse(0.0)}%.1f,"last_batch_sec":${perBatch.lastOption.getOrElse(0.0)}%.1f,"admitted":$admitted,"cpus":$cpus}""")
    spark.stop()
  }
}
