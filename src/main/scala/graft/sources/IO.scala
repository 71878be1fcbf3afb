package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Source/sink pack (SURVEY.md §2.A). The reference's connector surface —
  * Kafka topics between layers, MySQL-CDC ingest, HBase dim store, Doris
  * OLAP sink, HDFS checkpoints (reference `pom.xml:153-195,69-73`) — maps
  * onto Spark's format-pluggable readers/writers. Hermetically (zero
  * egress) the stream boundary is modeled with file/rate/memory sources;
  * on a cluster the same call sites take `format("kafka")` options.
  */
object IO {

  // ---- bounded (batch) sources -------------------------------------

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Parquet-footer schema cache for ENGINE-WRITTEN artifact dirs
    * (r18, guide §6 — the [[graft.sources.Tables]] testdata cache,
    * extended to index artifacts): without an explicit schema every
    * `spark.read.parquet` runs a footer-inference JOB (~20-25 ms of
    * scheduling locally; a listing + footer RPC round-trip per query on
    * a cluster). The cached value is the inferred StructType — metadata
    * only, never rows; the scan itself re-reads the files on every
    * action, so rewritten artifact CONTENT is always observed fresh.
    *
    * Contract: a path's SCHEMA is stable for the JVM lifetime. Every
    * artifact writer in this codebase overwrites a path with the
    * identical schema (vectors/centroids/codebooks/codes layouts are
    * fixed by their writers); a caller that rewrites one path with a
    * DIFFERENT schema must not read it through here. */
  private val artifactSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  def readArtifact(spark: SparkSession, path: String): DataFrame = {
    val schema = artifactSchemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** CSV with declared schema (never infer at scale — schema inference
    * reads the data twice). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** ORC — the second columnar format next to parquet (native in
    * spark-sql: same vectorized reader, predicate pushdown, and column
    * pruning contract). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines with declared schema; malformed rows land in
    * `_corrupt_record` when `keepCorrupt`, else are dropped (PERMISSIVE vs
    * DROPMALFORMED — the reference's dirty-JSON guard). */
  def readJson(spark: SparkSession, path: String, schema: StructType,
               keepCorrupt: Boolean = false): DataFrame = {
    val mode = if (keepCorrupt) "PERMISSIVE" else "DROPMALFORMED"
    spark.read.schema(schema).option("mode", mode).json(path)
  }

  // ---- unbounded (streaming) sources -------------------------------

  /** File stream source — the hermetic Kafka-topic stand-in: new files in
    * `dir` are consumed exactly once, offsets tracked in the checkpoint
    * (same at-least-once→exactly-once contract as the Kafka source). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format)
      .option("maxFilesPerTrigger", "16").load(dir)

  /** Rate source — deterministic load generator for soak tests. */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Kafka topic source — the cluster-side call site for the reference's
    * topic ingest (reference `pom.xml:153-156`): standard
    * `format("kafka")` option plumbing (bootstrap servers, subscribe
    * list, starting offsets, per-trigger rate cap). The returned frame
    * has the connector's fixed schema (key/value binary, topic,
    * partition, offset, timestamp); downstream parses `value`.
    *
    * This image carries no Kafka connector jar (zero egress), so
    * resolution fails at `load()` — the call site, option wiring, and
    * failure mode are covered by SourcesSpec via a recording stand-in
    * provider passed through `format`. */
  def kafkaStream(spark: SparkSession, bootstrapServers: String,
                  subscribe: String, startingOffsets: String = "latest",
                  maxOffsetsPerTrigger: Option[Long] = None,
                  format: String = "kafka"): DataFrame = {
    val reader = spark.readStream.format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }

  // ---- sinks --------------------------------------------------------

  /** Exactly-once file sink (the Doris/Kafka sink stand-in): Structured
    * Streaming's file sink commits atomically per micro-batch via the
    * checkpointed file-sink log. */
  def parquetSink(df: DataFrame, outDir: String, checkpointDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())

  /** Kafka topic sink — the cluster-side call site for the reference's
    * inter-layer topics (DWD → DWS), mirroring [[kafkaStream]]. The input
    * frame must already carry `value` (and optionally `key`) columns per
    * the connector contract; exactly-once downstream requires the
    * consumer to read committed only. `format` is the same test seam. */
  def kafkaSink(df: DataFrame, bootstrapServers: String, topic: String,
                checkpointDir: String, format: String = "kafka")
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())

  /** Streaming IVF index maintenance: each micro-batch of embeddings is
    * appended into a persisted IVF index via
    * [[graft.operators.Similarity.ivfAppendIndex]] — assign only the
    * batch, rewrite only the touched `ivf_list=` partitions. Replay
    * safety: the append is an id-level upsert, so a re-run batch
    * replaces its own rows and converges. The index (with centroids)
    * must already exist ([[graft.operators.Similarity.ivfWriteIndex]] is
    * the bootstrap); centroids are re-read per batch, so an offline
    * retrain is picked up at the next micro-batch. */
  def ivfIndexSink(vecs: DataFrame, indexDir: String, checkpointDir: String,
                   idCol: String, vecCol: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.ivfAppendIndex(batch, idCol, vecCol, indexDir)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Streaming FUSED (IVF-PQ) index ingest — the vector twin of
    * [[nearDupDedupSink]] (VERDICT r12 #8): each micro-batch of
    * embeddings appends through
    * [[graft.operators.Similarity.ivfPqAppendIndex]] (touched-lists-only
    * vector upsert + code refresh of exactly those lists — the
    * codes/vectors mirror holds after every batch), then the in-sink
    * drift policy runs the [[graft.operators.Similarity.ivfNeedsRetrain]]
    * census (a k-row metadata read, free per batch) and, when it fires,
    * applies the INCREMENTAL lever —
    * [[graft.operators.Similarity.ivfSplitOversizedLists]], whose fused
    * split re-derives the two touched code partitions per split. The
    * FULL retrain (the recall lever, corpus-proportional
    * [[graft.operators.Similarity.ivfPqRetrainIndex]]) stays an
    * operator/offline decision by design — the sink surfaces the need
    * (census true after a batch means scatter the splits can't fix may
    * be accruing) but never blocks ingest on a corpus-sized rebuild;
    * centroids + codebooks are re-read per batch, so an offline retrain
    * is picked up at the next micro-batch.
    *
    * Exactly-once: the marker pattern ([[idempotentForeachBatch]]) —
    * a replayed batch is consumed-but-skipped, so the retained index
    * bytes (and any split decisions) are untouched on replay, a
    * stronger guarantee than append-idempotence alone when the split
    * policy is active (a replay-rerun split would otherwise allocate a
    * fresh list id). Backfill shape: `AvailableNow`. The fused index
    * must already exist ([[graft.operators.Similarity.ivfPqWriteIndex]]
    * is the bootstrap); single writer by contract. */
  def ivfPqIndexSink(vecs: DataFrame, indexDir: String, checkpointDir: String,
                     idCol: String, vecCol: String,
                     splitSkewFactor: Double = 4.0)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$indexDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          graft.operators.Similarity.ivfPqAppendIndex(
            batch, idCol, vecCol, indexDir)
          if (graft.operators.Similarity.ivfNeedsRetrain(
              spark, indexDir, splitSkewFactor))
            graft.operators.Similarity.ivfSplitOversizedLists(
              spark, indexDir, idCol, vecCol, splitSkewFactor)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming corpus ingest with incremental NEAR-dup dedup: each
    * micro-batch dedups against the persisted MinHash band index
    * ([[graft.operators.Dedup.nearDupAgainstIndex]] — intra-batch
    * collapse, then candidates-only exact confirm vs the index), novel
    * survivors append to BOTH the clean-corpus output and the index
    * ([[graft.operators.Dedup.appendNearDupIndex]]), so later batches
    * dedup against everything already admitted. The checkpoint makes
    * input consumption exactly-once; the two appends are idempotent
    * under replay only if the sink completed the batch — same
    * single-writer/at-least-once append contract as the IVF index sink,
    * appropriate for the backfill (`AvailableNow`) ingest shape. */
  def nearDupDedupSink(docs: DataFrame, indexDir: String, outDir: String,
                       checkpointDir: String, idCol: String, textCol: String,
                       threshold: Double)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val survivors = graft.operators.Dedup
          .nearDupAgainstIndex(batch, idCol, textCol, indexDir, threshold)
          .localCheckpoint(true) // one computation feeds both appends
        survivors.write.mode("append").parquet(outDir)
        graft.operators.Dedup.appendNearDupIndex(
          survivors, idCol, textCol, indexDir)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Streaming corpus ingest with benchmark DECONTAMINATION at the
    * gate — the streaming twin of the batch `q_decontaminate` pass:
    * each micro-batch drops every document sharing ANY word `n`-gram
    * with the probe/benchmark set (read fresh from `probeDir` per
    * batch, so a grown benchmark suite tightens the gate without a
    * restart), appends survivors to the clean corpus at `outDir` and
    * flagged docs to `quarantineDir` — the audit trail a hygiene review
    * reads (and the takedown path replays). The contaminated-id
    * relation is computed ONCE per batch
    * ([[graft.operators.Dedup.contaminatedIds]] — probe shingles
    * broadcast, corpus side one narrow explode, never a corpus
    * shuffle) and feeds both routes. Exactly-once: both appends happen
    * under ONE committed-batch marker ([[idempotentForeachBatch]]), so
    * a replayed batch is a no-op and a crash between the two appends
    * replays both (parquet job commits are restartable; the quarantine
    * append runs FIRST so a torn batch can only leave audit rows
    * without corpus rows — the conservative direction, never an
    * unaudited corpus doc). */
  def decontaminateIngestSink(docs: DataFrame, probeDir: String,
                              outDir: String, quarantineDir: String,
                              checkpointDir: String, idCol: String,
                              textCol: String, n: Int = 5)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          val probe = spark.read.parquet(probeDir)
          val b = batch.localCheckpoint(true) // one scan feeds both routes
          val flagged = graft.operators.Dedup
            .contaminatedIds(b, probe, idCol, textCol, n)
            .localCheckpoint(true)
          b.join(flagged, Seq(idCol), "left_semi")
            .write.mode("append").parquet(quarantineDir)
          b.join(flagged, Seq(idCol), "left_anti")
            .write.mode("append").parquet(outDir)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming corpus ingest with SURGICAL decontamination at the gate
    * — the excision twin of [[decontaminateIngestSink]] (live
    * `q_decontaminate_spans`): instead of dropping every doc sharing a
    * probe n-gram, each micro-batch EXCISES exactly the probe-matching
    * maximal token spans
    * ([[graft.operators.Dedup.removeContaminatedSpans]] — probe read
    * fresh per batch, so a grown benchmark tightens the gate without
    * restart), admits the cleaned text (untouched docs verbatim), and
    * drops only docs the excision EMPTIES (verbatim benchmark copies —
    * the whole-doc-drop outcome recovered exactly where it is right).
    * Every excision writes an audit row (id, n_tokens, n_removed,
    * emptied) to `auditDir` — the hygiene trail a review reads, the
    * surgical sibling of the drop sink's quarantine. Exactly-once: both
    * appends under ONE committed-batch marker; the audit append runs
    * FIRST, so a torn batch can only leave audit rows without corpus
    * rows — never an unaudited excision. */
  def decontaminateSpanSink(docs: DataFrame, probeDir: String,
                            outDir: String, auditDir: String,
                            checkpointDir: String, idCol: String,
                            textCol: String, n: Int = 5)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          val probe = spark.read.parquet(probeDir)
          val b = batch.localCheckpoint(true) // feeds excision + re-join
          val cleaned = graft.operators.Dedup
            .removeContaminatedSpans(b, probe, idCol, textCol, n)
            .withColumnRenamed("id", idCol)
            .localCheckpoint(true) // one excision feeds audit + admit
          cleaned.filter(col("n_removed") > 0)
            .select(col(idCol), col("n_tokens"), col("n_removed"),
              (col("clean_text") === "").as("emptied"))
            .write.mode("append").parquet(auditDir)
          b.drop(textCol)
            .join(cleaned.filter(col("clean_text") =!= "")
              .select(col(idCol), col("clean_text").as(textCol)),
              Seq(idCol))
            .write.mode("append").parquet(outDir)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming QUALITY gate — the live form of the DSIR selection pair
    * (`q_dsir_hashed` weights, `q_dsir_select` cut): each micro-batch
    * is scored against the hashed-unigram log-ratio LM persisted at
    * `lmDir` ([[graft.operators.Sampling.dsirLm]] writes it — ≤ 4096
    * rows, broadcast), and docs whose MEAN per-token log-ratio clears
    * `thresholdPicoPerToken` are admitted to `outDir`; every doc gets
    * an audit row (id, n_tokens, weight_pico, admitted) appended FIRST
    * (never an unaudited decision — the decontaminateSpanSink
    * discipline). The comparison is exact integer arithmetic
    * (weight_pico ≥ threshold·n_tokens — no division), so a replayed
    * batch reproduces its decisions bit-for-bit; the LM is RE-READ per
    * micro-batch, so retraining the reference (new target corpus)
    * tightens the gate without a restart. The SEVENTH ingest gate
    * (exact-dup, near-dup, winnow, semantic, decontaminate ×2 — and now
    * quality): the batch ids decide what a good corpus is, the gate
    * applies it as data arrives. Replay semantics (ADVICE r15 wording
    * fix): the committed-batch marker makes a COMMITTED batch's replay
    * a no-op, and the audit append runs first so a torn batch can only
    * leave audit rows without corpus rows — but a crash BETWEEN an
    * append's job commit and the marker write replays the whole batch,
    * duplicating already-appended rows (at-least-once for torn
    * batches, the mixDriftAuditSink caveat). Decisions replay
    * bit-for-bit, so readers needing exactly-once dedup on (id) at
    * read time — duplicates are identical rows. */
  def dsirGateSink(docs: DataFrame, lmDir: String, outDir: String,
                   auditDir: String, checkpointDir: String,
                   idCol: String, textCol: String,
                   thresholdPicoPerToken: Long, buckets: Int = 4096)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          val lm = spark.read.parquet(lmDir).select("b", "ratio_pico")
          val b = batch.localCheckpoint(true) // feeds scoring + admit join
          val scored = graft.operators.Sampling
            .dsirScore(b, idCol, textCol, lm, buckets)
            .withColumn("admitted",
              col("weight_pico") >= lit(thresholdPicoPerToken) * col("n_tokens"))
            .localCheckpoint(true) // one scoring pass feeds audit + admit
          // token-less docs never reach the explode — audit them as
          // rejected (0 tokens, 0 weight) so every input has a decision
          val unscored = b.select(col(idCol))
            .join(scored.select(idCol), Seq(idCol), "left_anti")
            .select(col(idCol), lit(0L).as("n_tokens"),
              lit(0L).as("weight_pico"), lit(false).as("admitted"))
          scored.select(col(idCol), col("n_tokens"), col("weight_pico"),
              col("admitted"))
            .union(unscored)
            .write.mode("append").parquet(auditDir)
          b.join(scored.filter(col("admitted")).select(idCol), Seq(idCol))
            .write.mode("append").parquet(outDir)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming DIVERSITY gate — the EIGHTH ingest gate (exact-dup,
    * near-dup, winnow, semantic, decontaminate ×2, quality — and now
    * diversity; VERDICT r15 #2): the live form of the
    * `q_diversity_sample` cap. A vector is admitted while its semantic
    * LSH bucket ([[graft.operators.Sampling.diversityBucket]] — the
    * exact oracle-checked bucketing) is under `cap` against the
    * persisted BUCKET-MEMBERSHIP index at `indexDir`: (bucket, id) rows
    * appended per batch — id-attributed deliberately (NOT a count
    * census) so the takedown verb
    * ([[graft.operators.Sampling.deleteFromBucketMembershipIndex]])
    * is row-targeted and replay-idempotent, and a taken-down vector
    * FREES its bucket budget. Live occupancy comes from the CENSUS
    * sidecar ([[graft.operators.Sampling.readBucketOccupancy]] — ≤
    * 2^planes (bucket, n_occ) rows maintained incrementally per batch
    * and rebuilt by the seed/takedown verbs), so the per-batch state
    * read is O(2^planes) REGARDLESS of admitted-corpus size — the
    * cheapest gate state of the eight (ADVICE r16: the previous
    * grouped-count fold re-scanned the whole id-attributed index every
    * micro-batch). Intra-batch
    * collapse rides [[graft.operators.Sampling.diversityCapRanked]]
    * (bounded-heap bottom-`cap` per bucket in deterministic md5 order —
    * O(cap) state per bucket, never a window): a batch rank can never
    * exceed `cap` and the remaining budget never exceeds `cap`, so
    * trimming the bottom-`cap` to `rn + occupancy ≤ cap` is the exact
    * greedy admission. Cold start: missing index = zero occupancy (the
    * nearDupAgainstIndex contract); seed it from an existing corpus
    * with [[graft.operators.Sampling.writeBucketMembershipIndex]].
    *
    * Replay semantics: committed batches are marker no-ops. Torn
    * batches: the corpus append runs FIRST, so a crash before the index
    * append replays identical decisions (occupancy unchanged) and can
    * only duplicate identical corpus rows (at-least-once); a crash
    * AFTER the index append self-bills the batch's own admissions on
    * replay — the re-ranked rows land beyond the advanced budget and
    * admit nothing extra, the conservative direction (the
    * semanticDedupSink torn-batch shape). */
  def diversityGateSink(vecs: DataFrame, indexDir: String, outDir: String,
                        checkpointDir: String, idCol: String,
                        vecCol: String, cap: Int, buckets: Int = 64)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          val b = batch.localCheckpoint(true) // feeds ranking + admit join
          val ranked = graft.operators.Sampling
            .diversityCapRanked(b, idCol, vecCol, cap)
            .select(col("bucket"), col("rn"), col(idCol))
          // occupancy from the CENSUS sidecar (≤ 2^planes rows), never a
          // per-batch scan of the id-attributed index (ADVICE r16: that
          // fold's input grew with the admitted corpus). A pre-census
          // index derives once and materializes below; a missing index
          // is zero occupancy (cold start). Pinned: the filtered census
          // feeds the admission AND the advance below, and the advance's
          // swap must not re-read the dir it is replacing.
          val occ = graft.operators.Sampling
            .readBucketOccupancy(spark, indexDir)
            .localCheckpoint(true)
          val admitted = ranked
            .join(broadcast(occ), Seq("bucket"), "left")
            .na.fill(0L, Seq("n_occ"))
            .filter(col("rn") + col("n_occ") <= cap.toLong)
            .localCheckpoint(true) // feeds the corpus append + the delta
          // zero-admission batches (empty micro-batch, or every bucket
          // at cap) must not write: an EMPTY partitioned append creates
          // a schema-less dir (only _SUCCESS) that poisons the next
          // batch's occupancy read with UNABLE_TO_INFER_SCHEMA
          if (!admitted.isEmpty) {
            b.join(admitted.select(idCol), Seq(idCol), "left_semi")
              .write.mode("append").parquet(outDir)
            val bkts = readBucketCount(spark, indexDir).getOrElse(buckets)
            val delta = admitted
              .select(col("bucket"), col(idCol).cast("long").as("id"))
              .withColumn("__bucket",
                pmod(xxhash64(col("bucket")), lit(bkts.toLong)))
            alignToPartitions(delta, "__bucket")
              .write.mode("append").partitionBy("__bucket").parquet(indexDir)
            if (readBucketCount(spark, indexDir).isEmpty)
              writeBucketCount(spark, indexDir, bkts)
            // census advance LAST (corpus → index → census): a crash
            // before this line replays the batch against the old census
            // — identical decisions, duplicate-but-identical corpus/index
            // rows (countDistinct census semantics absorb them); a crash
            // after it self-bills the replay (admits nothing extra) —
            // the conservative direction, as before
            graft.operators.Sampling.advanceBucketCensus(
              occ, admitted.select("bucket"), indexDir)
          }
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming embedding ingest with SEMANTIC dedup at the gate — the
    * vector twin of [[nearDupDedupSink]]: each micro-batch drops
    * vectors within `threshold` cosine of anything already admitted
    * ([[graft.operators.Similarity.semanticDedupAgainstIndex]] —
    * probe-pruned, never a full index scan), appends survivors to the
    * clean output AND the IVF index
    * ([[graft.operators.Similarity.ivfAppendIndex]], touched-lists
    * only), so later batches dedup against everything admitted. The
    * index must be PRE-SEEDED with
    * [[graft.operators.Similarity.ivfWriteIndex]] (IVF centroids need
    * training data — there is no meaningful cold-start training on an
    * arbitrary first micro-batch; seed on a representative sample).
    * Plain (unfused) index only: the in-sink append is a plain mutation
    * verb and refuses a fused index. Exactly-once via the
    * committed-batch marker over both effects. INTRA-batch near-dups
    * collapse too ([[graft.operators.Similarity.semanticCollapseBatch]]
    * — min-id canonical per within-batch family under the same probe
    * geometry and threshold), so a bursty producer emitting the same
    * embedding twice in one micro-batch admits exactly one copy — full
    * parity with [[nearDupDedupSink]]'s intra-batch step (VERDICT r13
    * #1). Torn-batch note: a crash AFTER the index append but before
    * the marker leaves the batch's own vectors indexed; the replay then
    * self-matches them against the index and admits nothing — no
    * duplicate corpus rows, the conservative direction (the out-append
    * rows from the torn run, if any landed, stay). */
  def semanticDedupSink(vecs: DataFrame, indexDir: String, outDir: String,
                        checkpointDir: String, idCol: String, vecCol: String,
                        threshold: Double, nprobe: Int = 4)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val intra = graft.operators.Similarity
            .semanticCollapseBatch(batch, idCol, vecCol, indexDir,
              threshold, nprobe)
            .localCheckpoint(true) // feeds the index-gate join twice
          val novel = graft.operators.Similarity
            .semanticDedupAgainstIndex(intra, idCol, vecCol, indexDir,
              threshold, nprobe)
            .localCheckpoint(true) // one computation feeds both appends
          novel.write.mode("append").parquet(outDir)
          graft.operators.Similarity.ivfAppendIndex(
            novel.select(col(idCol), col(vecCol)), idCol, vecCol, indexDir)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming corpus ingest with a WINNOWING substring gate — the
    * local-guarantee sibling of [[nearDupDedupSink]] (MinHash gates on
    * whole-document similarity and can miss with LSH probability; the
    * winnow gate flags ANY batch doc sharing a ≥8-token run with
    * admitted content, deterministically, modulo the df cap): per
    * micro-batch, the batch is winnowed ONCE
    * ([[graft.operators.Dedup.winnowFingerprints]]) and that single
    * selection feeds BOTH gates — (1) INTRA-batch collapse:
    * within-batch overlap pairs
    * ([[graft.operators.Dedup.winnowPairsFromFps]]) cluster and keep
    * the min-id canonical per family
    * ([[graft.operators.Dedup.keepCanonical]]), so two overlapping docs
    * in the SAME micro-batch admit exactly one (parity with
    * [[nearDupDedupSink]] — VERDICT r13 #1), the dropped ones flagged
    * with their best within-batch partner; (2) the INDEX gate:
    * intra-survivors matching admitted content
    * ([[graft.operators.Dedup.matchFpsAgainstWinnowIndex]]) flag with
    * their best indexed match. Both flag routes append to `flaggedDir`
    * (the full doc row + match_id, n_shared, score — the audit a review
    * reads), survivors append to `outDir`, and the survivors'
    * already-computed fingerprints advance the index
    * ([[graft.operators.Dedup.appendWinnowFps]] — no second winnow
    * pass) so later batches gate against everything admitted. Cold
    * start: a missing index admits the intra-collapsed first batch and
    * seeds.
    *
    * Replay semantics (narrowed from "exactly-once over all effects" —
    * ADVICE r13): the committed-batch marker makes a COMPLETED batch an
    * exact no-op on replay. A crash mid-batch replays it, and the
    * gating DECISIONS are replay-stable even when the crash landed
    * after the index append: index matches against the batch's OWN ids
    * are excluded (through the index a batch doc could only meet itself
    * or a same-batch sibling the intra gate already adjudicated), and
    * the matcher counts DISTINCT shared hashes, so the duplicate index
    * rows a replayed append leaves inflate nothing. What a torn batch
    * CAN leave is duplicated audit/corpus rows from re-run appends —
    * the [[decontaminateIngestSink]] torn-window semantics, never
    * spurious self-flags. */
  def winnowIngestSink(docs: DataFrame, indexDir: String, outDir: String,
                       flaggedDir: String, checkpointDir: String,
                       idCol: String, textCol: String,
                       minShared: Long = 2L)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val b = batch.localCheckpoint(true) // one scan feeds both routes
          // ONE winnow pass serves the intra gate, the index gate and
          // the final index append
          val fps = graft.operators.Dedup
            .winnowFingerprints(b, idCol, textCol)
            .localCheckpoint(true)
          def bestOf(m: DataFrame): DataFrame = m
            .groupBy(idCol)
            .agg(max(struct(col("n_shared"), col("score"), col("match_id")))
              .as("m"))
            .select(col(idCol), col("m.match_id").as("match_id"),
              col("m.n_shared").as("n_shared"), col("m.score").as("score"))
          // gate 1: intra-batch collapse, min-id canonical per family
          val intraPairs = graft.operators.Dedup
            .winnowPairsFromFps(fps, minShared = minShared)
            .localCheckpoint(true) // feeds keepCanonical + the audit rows
          val intra = graft.operators.Dedup
            .keepCanonical(b, intraPairs, idCol)
            .localCheckpoint(true) // feeds the index gate + both appends
          val intraFlag = bestOf(intraPairs
              .select(col("id_a").as(idCol), col("id_b").as("match_id"),
                col("n_shared"), col("score"))
              .unionAll(intraPairs
                .select(col("id_b").as(idCol), col("id_a").as("match_id"),
                  col("n_shared"), col("score"))))
            .join(intra.select(idCol), Seq(idCol), "left_anti")
          // gate 2: the index gate, on intra-survivors' fingerprints
          // only; the batch's own ids are excluded from matches so a
          // replayed torn batch (index append landed, marker didn't)
          // reproduces the original decisions instead of self-flagging
          val matches = graft.operators.Dedup
            .matchFpsAgainstWinnowIndex(
              fps.join(intra.select(col(idCol).as("id")), Seq("id"),
                "left_semi"),
              idCol, indexDir, minShared = minShared)
            .join(b.select(col(idCol).as("match_id")), Seq("match_id"),
              "left_anti")
            .localCheckpoint(true) // feeds the audit rows + the anti-join
          b.join(intraFlag.unionAll(bestOf(matches)), Seq(idCol), "inner")
            .write.mode("append").parquet(flaggedDir)
          val novel = intra
            .join(matches.select(idCol), Seq(idCol), "left_anti")
            .localCheckpoint(true) // feeds the corpus append AND the index
          novel.write.mode("append").parquet(outDir)
          graft.operators.Dedup.appendWinnowFps(
            fps.join(novel.select(col(idCol).as("id")), Seq("id"),
              "left_semi"),
            indexDir)
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** The COMPOSED live ingest chain — every hygiene gate in ONE
    * streaming sink (VERDICT r16 #1): per micro-batch, exact-dedup →
    * near-dup → (winnow) → (decontaminate) → (DSIR quality) →
    * (diversity) — stage set per [[graft.operators.ChainConfig]] —
    * admitting survivors to `outDir`, advancing EVERY gate artifact
    * (fp, band, winnow, bucket-membership + census), and writing one
    * ledger row per batch (`outDir/_ledger` — the buildCorpus
    * CorpusLedger at batch grain) plus the per-doc decisions audit
    * (`outDir/_decisions` — every input doc named by the stage that
    * dropped it). Until now a user had to wire the eight standalone
    * gate sinks by hand; this is the production composition, and each
    * stage is the SAME operator its standalone sink runs.
    *
    * ONE COMMIT POINT (VERDICT r16 #2): the per-batch decisions WAL.
    * The decide phase mutates nothing and persists its outcome
    * atomically (parquet job commit); the apply phase replays effects
    * FROM the WAL, each idempotent or duplicate-harmless (see
    * [[graft.operators.CorpusBuild.chainApply]]). A crash between any
    * two effects recovers to the consistent state on restart: the
    * replayed batch finds the WAL, skips recomputation (so
    * half-advanced indexes can never change its decisions) and
    * re-applies everything; the committed-batch marker then makes
    * fully-applied batches no-ops. Corpus and ledger are
    * batch-partitioned dynamic overwrites — exactly-once, not just
    * at-least-once (corpus readers see a `__batch` partition column;
    * compact with [[compactPartitionedDir]], expire with
    * [[expirePartitions]]). */
  def composedIngestSink(docs: DataFrame, outDir: String,
                         checkpointDir: String,
                         cfg: graft.operators.ChainConfig)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$outDir/_markers") {
        (batch: DataFrame, batchId: Long) =>
          val spark = batch.sparkSession
          val b = batch.localCheckpoint(true) // one consume, all stages
          if (!b.isEmpty) {
            val walPath = s"$outDir/_decisions/__batch=$batchId"
            val fs = new org.apache.hadoop.fs.Path(walPath)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            // a COMMITTED WAL (job-commit _SUCCESS) marks the batch as
            // mid-apply when it crashed — skip decide, re-apply from it;
            // a torn WAL write (no _SUCCESS) is pre-commit: recompute
            // (nothing was mutated) and overwrite
            val isReplay = fs.exists(
              new org.apache.hadoop.fs.Path(s"$walPath/_SUCCESS"))
            if (!isReplay)
              graft.operators.CorpusBuild.chainDecide(b, cfg)
                .write.mode("overwrite").parquet(walPath)
            graft.operators.CorpusBuild.chainApply(b,
              spark.read.parquet(walPath), outDir, cfg, batchId, isReplay)
          }
          ()
      })
      .trigger(Trigger.AvailableNow())

  /** Streaming INCREMENTAL connected components: each micro-batch of
    * edges folds into a persisted (id, label) component labeling via
    * [[graft.operators.Dedup.componentsMerge]] — contract the batch
    * through the current labels, cluster the batch-sized contracted
    * graph, relabel only touched components. The labeling snapshot
    * swaps with the [[upsertSink]] write-then-swap discipline (never a
    * moment without a readable snapshot; `_bak` recovers a crash
    * between renames). Replay safety: componentsMerge is IDEMPOTENT —
    * re-folding an already-applied batch contracts every edge to
    * within-component self-pairs and the relabel is the identity — so
    * at-least-once batch delivery converges. Missing snapshot = empty
    * labeling (the nearDupAgainstIndex cold-start contract).
    * ScalePathSpec pins incremental == full-recompute across batches. */
  def componentsSink(edges: DataFrame, labelsDir: String,
                     checkpointDir: String,
                     idA: String = "id_a", idB: String = "id_b")
      : DataStreamWriter[org.apache.spark.sql.Row] =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dst = new org.apache.hadoop.fs.Path(labelsDir)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bak = new org.apache.hadoop.fs.Path(labelsDir + "_bak")
        val tmp = new org.apache.hadoop.fs.Path(labelsDir + "_tmp")
        val readFrom =
          if (fs.exists(dst)) dst else if (fs.exists(bak)) bak else null
        val labelSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType, nullable = false)))
        val existing =
          if (readFrom == null)
            spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), labelSchema)
          else spark.read.schema(labelSchema).parquet(readFrom.toString)
        // the _tmp write fully consumes the read of the live snapshot
        // BEFORE any rename touches it — no read-own-input hazard and no
        // node-sized checkpoint needed
        graft.operators.Dedup.componentsMerge(existing, batch, idA, idB)
          .write.mode("overwrite").parquet(tmp.toString)
        def must(ok: Boolean, what: String): Unit =
          if (!ok) throw new java.io.IOException(s"componentsSink: $what failed")
        fs.delete(bak, true)
        if (fs.exists(dst)) must(fs.rename(dst, bak), s"rename $dst -> $bak")
        must(fs.rename(tmp, dst), s"rename $tmp -> $dst")
        fs.delete(bak, true)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Streaming incremental connected components over the BUCKETED
    * store: [[componentsSink]]'s swap rewrites the whole labeling per
    * micro-batch (never a moment without a readable snapshot — right
    * for serving); this variant folds each batch via
    * [[graft.operators.Dedup.mergeIntoComponentsStore]], rewriting ONLY
    * the touched label-buckets — the write-volume-proportional shape
    * for large labelings. Durability trade documented there: dynamic
    * partition overwrite is per-partition-atomic, and a replayed batch
    * converges (re-contracting its edges re-derives the merge), so
    * at-least-once delivery is safe; the store must be seeded with
    * [[graft.operators.Dedup.writeComponentsStore]] (possibly empty).
    * Routing is SIZE-GATED ([[graft.operators.Dedup
    * .mergeComponentsStore]]): labelings at or below `maxFlatRows` take
    * the flat-snapshot rewrite (measured cheaper below the gate —
    * BASELINE.md "components store gate"), larger ones the bucketed
    * touched-partitions path; both produce the identical labeling.
    * ScalePathSpec pins parity with the swap sink and across routes. */
  def componentsStoreSink(edges: DataFrame, storeDir: String,
                          checkpointDir: String, buckets: Int = 64,
                          idA: String = "id_a", idB: String = "id_b",
                          maxFlatRows: Long =
                            graft.operators.Dedup.ComponentsStoreMaxFlatRows)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.mergeComponentsStore(
          batch, storeDir, idA, idB, buckets, maxFlatRows)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Keyed upsert sink (the HBase dim-writer analog): every micro-batch is
    * merged into the keyed snapshot directory with last-writer-wins
    * semantics; deletes (`op='d'`) are applied. Overwrites the snapshot
    * atomically per batch (read → merge → rewrite), which is the hermetic
    * stand-in for HBase put/delete RPCs. */
  def upsertSink(df: DataFrame, snapshotDir: String, checkpointDir: String,
                 keyCol: String, snapshotSchema: StructType)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dst = new org.apache.hadoop.fs.Path(snapshotDir)
        // resolve the snapshot path's OWN filesystem (s3a://, hdfs://, …),
        // not the default FS
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bak = new org.apache.hadoop.fs.Path(snapshotDir + "_bak")
        val tmp = new org.apache.hadoop.fs.Path(snapshotDir + "_tmp")
        // recover from a crash between the renames below: the previous
        // snapshot lives on at _bak until the new one is in place
        val readFrom =
          if (fs.exists(dst)) dst else if (fs.exists(bak)) bak else null
        val existing =
          if (readFrom == null)
            spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), snapshotSchema)
          else spark.read.schema(snapshotSchema).parquet(readFrom.toString)
        val merged = graft.streaming.Cdc.applyChangelog(existing, batch, keyCol)
        // write-then-swap, never a moment without a readable snapshot:
        // write _tmp → move current to _bak → move _tmp in → drop _bak
        merged.write.mode("overwrite").parquet(tmp.toString)
        // Hadoop rename/delete report most failures via `false`, not an
        // exception — a swallowed failure here would let the checkpoint
        // commit a batch whose merge was silently stranded at _tmp
        def must(ok: Boolean, what: String): Unit =
          if (!ok) throw new java.io.IOException(s"upsertSink: $what failed")
        fs.delete(bak, true) // best-effort pre-clean; verified below
        if (fs.exists(dst)) must(fs.rename(dst, bak), s"rename $dst -> $bak")
        must(fs.rename(tmp, dst), s"rename $tmp -> $dst")
        fs.delete(bak, true)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Exactly-once to a NON-idempotent sink: wrap the per-batch action
    * with a committed-batch marker. Spark's checkpoint guarantees each
    * batch id is DELIVERED at least once across restarts; sinks whose
    * writes don't dedup by themselves (append files, external POSTs —
    * the reference's Doris stream-load 2PC territory) must skip replayed
    * ids. The marker (`<markerDir>/<batchId>`) is written AFTER `f`
    * succeeds: a crash inside `f` replays the batch (at-least-once into
    * `f`), a crash after the marker skips it — so `f`'s effects must be
    * atomic-or-restartable, which parquet job commits are. */
  def idempotentForeachBatch(markerDir: String)
                            (f: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val dir = new org.apache.hadoop.fs.Path(markerDir)
    val fs = dir.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, batchId.toString)
    if (!fs.exists(marker)) {
      f(batch, batchId)
      fs.mkdirs(dir)
      fs.create(marker, true).close()
    } else {
      // a SKIPPED batch must still be CONSUMED: for a stateful upstream
      // (windowed aggregates) every state-store partition commits only
      // when its task runs under the batch's execution, and Spark
      // validates those commits per batch — skipping the scan entirely
      // fails the replayed query. An eager localCheckpoint is the same
      // full-partition consume the non-skip path performs; the blocks
      // are dropped immediately.
      graft.operators.Checkpoints.drop(batch.localCheckpoint(true))
    }
  }

  /** Versioned (time-travel) keyed upsert sink: each micro-batch merges
    * into the LATEST snapshot version and writes the result as a NEW
    * immutable `v=<n>` directory — old versions are never mutated, so a
    * reader pinned on any retained version is untouched by concurrent
    * writer progress (the snapshot-isolation property Delta/Iceberg
    * tables give; here in plain parquet). The version pointer is the
    * largest COMPLETE `v=<n>` dir (`_SUCCESS` present — a crashed write
    * leaves an incomplete dir the listing ignores, and the uncommitted
    * checkpoint replays the batch). `retain` bounds disk: older versions
    * delete only after the new version commits. */
  def versionedUpsertSink(df: DataFrame, baseDir: String, checkpointDir: String,
                          keyCol: String, snapshotSchema: StructType,
                          retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    require(retain >= 1, "retain must be >= 1")
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        versionedUpsertBatch(batch, baseDir, keyCol, snapshotSchema, retain)
      }
      .trigger(Trigger.AvailableNow())
  }

  /** One versioned-upsert commit (the [[versionedUpsertSink]] batch
    * body, shared with [[windowedMetricsStoreSink]]): merge the
    * changelog batch into the latest complete `v=<n>` snapshot, write
    * the result as the next immutable version, GC beyond `retain`. */
  private def versionedUpsertBatch(batch: DataFrame, baseDir: String,
                                   keyCol: String,
                                   snapshotSchema: StructType,
                                   retain: Int): Unit = {
    val spark = batch.sparkSession
    val versions = snapshotVersions(spark, baseDir)
    val existing = versions.lastOption match {
      case Some(v) => readSnapshotVersion(spark, baseDir, v, snapshotSchema)
      case None => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), snapshotSchema)
    }
    val merged = graft.streaming.Cdc.applyChangelog(existing, batch, keyCol)
    val next = versions.lastOption.getOrElse(0L) + 1
    merged.write.mode("overwrite").parquet(f"$baseDir/v=$next%05d")
    // GC strictly-older versions beyond the retention window
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    snapshotVersions(spark, baseDir).dropRight(retain).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(f"$baseDir/v=$v%05d"), true)
    }
    ()
  }

  /** Snapshot schema of the [[windowedMetricsStoreSink]] store: one wide
    * metrics row per finalized window, plus the changelog bookkeeping
    * columns the versioned merge orders by. */
  val WindowedMetricsSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_pos", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_neg", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("auc", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("avg_prec", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted per-window EVAL-METRICS store — the Doris-analog sink
    * for the eval pack (VERDICT r10 #6): finalized
    * [[graft.streaming.Jobs.windowedClassHistogram]] micro-batches fold
    * into ONE wide metrics row per window (ROC-AUC + average precision —
    * the literal q_auc / q_avg_precision folds, so batch/stream parity
    * is inherited, not re-proven) and upsert into the versioned
    * time-travel snapshot, keyed by `window_start`.
    *
    * EXACTLY-ONCE across replays: the fold+merge runs under
    * [[idempotentForeachBatch]], so a redelivered micro-batch
    * (checkpoint rollback, restart-from-scratch) writes NOTHING — no
    * new version, no duplicate rows (StreamingSpec golden). Changelog
    * ordering rides `ts_ms` = the window's own epoch millis, never wall
    * clock — replay determinism requires the payload to be a pure
    * function of the data. Windows finalize once in append mode, so
    * rows are pure inserts in steady state; one-class windows carry no
    * AUC and are dropped (the q_auc contract). Time-travel: any
    * retained `v=<n>` reproduces the metric state at that commit
    * ([[readSnapshotVersion]] + [[graft.streaming.Cdc.liveView]]). */
  def windowedMetricsStoreSink(hist: DataFrame, baseDir: String,
                               checkpointDir: String, retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check: the eager checkpoint consumes
          // every partition, which is what commits the stateful
          // operator's state stores (a short-circuiting isEmpty on the
          // raw batch fails Spark's per-batch commit validation); it
          // also feeds the two metric folds once
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs.aucPerWindow(pinned)
                .join(graft.streaming.Jobs.apPerWindow(pinned)
                    .select(col("window_start"), col("avg_prec")),
                  Seq("window_start"))
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                WindowedMetricsSchema, retain)
            }
            // unpersist does NOT free localCheckpoint blocks: drop the
            // pinned RDD once the upsert has consumed it, or a
            // long-running query accumulates one batch-sized block set
            // per micro-batch for its whole lifetime (takedownSink
            // discipline)
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[corpusAuditStoreSink]] store: one
    * contamination row per finalized ingest window plus the changelog
    * bookkeeping columns. */
  val CorpusAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_shingles", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_hit", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("contam_ppm", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted per-window CORPUS-AUDIT metrics store — the corpus-
    * monitoring twin of [[windowedMetricsStoreSink]] (VERDICT r13 #5):
    * finalized [[graft.streaming.Jobs.windowedShingleHits]] micro-
    * batches fold through the LITERAL batch ppm fold
    * ([[graft.streaming.Jobs.contaminationFracPerWindow]] —
    * `q_contamination_frac` parity by construction) and upsert into the
    * versioned time-travel snapshot keyed by `window_start`. Same
    * guarantees as the eval store, inherited from the same machinery:
    * exactly-once under replay (committed-batch markers — a redelivered
    * batch writes nothing), data-derived changelog ordering
    * (`ts_ms = window_start·1000`), time travel via retained `v=<n>`
    * snapshots. What an ingest operator watches to catch a benchmark
    * leak the moment a window closes. */
  def corpusAuditStoreSink(hist: DataFrame, baseDir: String,
                           checkpointDir: String, retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs
                .contaminationFracPerWindow(pinned)
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                CorpusAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[noveltyAuditSink]] store: one novelty
    * row per finalized ingest window plus the changelog bookkeeping
    * columns. */
  val NoveltyAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_grams", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_novel", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("novelty_ppm", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted per-window NOVELTY monitor — the live twin of the batch
    * `q_ngram_novelty` id, completing the corpus-audit monitoring trio
    * (contamination, boilerplate, novelty): finalized
    * [[graft.streaming.Jobs.windowedGramDocFreq]] micro-batches fold
    * through [[graft.streaming.Jobs.noveltyPerWindow]] against a
    * PERSISTED first-seen gram index (`__bucket=pmod(sh, buckets)`
    * layout — the fingerprint-index partitioning; maintenance rides
    * [[compactPartitionedDir]] like every bucketed artifact), upsert
    * into the versioned time-travel snapshot keyed by `window_start`,
    * then append the window's first-seen grams to the index (anti-join
    * delta — append cost ∝ NEW grams, never gram history; the
    * [[graft.operators.Dedup.appendFingerprintIndex]] discipline:
    * delta materialized before the write so appended files never join
    * their own input scan). A falling `novelty_ppm` curve is the
    * "crawl started re-reading itself" alarm, live.
    *
    * TAKEDOWN POSITION (deliberate, not a missing verb): the gram
    * index carries only 8-byte one-way hashes of 3-token windows with
    * NO doc attribution — a statistical census like the metrics
    * store's aggregate rows, not retrievable content — and a first-
    * seen census has no per-doc delete semantics without reference
    * counts (a gram first seen in a taken-down doc may legitimately
    * remain via other admitted docs). Document-level opt-out rides the
    * doc-attributed artifacts (fingerprint / near-dup / winnow index
    * delete verbs + `takedownSink`); rebuilding this index from the
    * post-takedown corpus ([[graft.operators.Dedup.writeGramIndex]])
    * is the census-level remedy when one is wanted — and since round
    * 15 the COUNTED ledger variant
    * ([[graft.operators.Dedup.writeGramIndexCounted]] family) gives
    * per-doc takedown with rebuild-exact semantics and still zero
    * stored attribution: takedown appends negated doc-counts computed
    * from the retired docs' own text, cost ∝ the retirement batch
    * (delete == rebuild law in ScalePathSpec;
    * [[graft.operators.Dedup.firstSeenFromCounted]] serves this sink's
    * (sh, first_window) relation from it).
    *
    * Replay semantics (honest torn-window statement, the
    * decontaminateIngestSink convention): a batch whose marker
    * committed replays as a no-op. A TORN batch (some effects landed,
    * marker didn't) replays with STABLE decisions — the fold attributes
    * an indexed gram whose `first_window` falls inside the batch to
    * that window, and the index append's anti-join delta is empty on
    * the second pass — so the store's live content and the index
    * converge to exactly the un-torn outcome; the only scar is a
    * possible extra snapshot version with identical live rows. */
  def noveltyAuditSink(hist: DataFrame, gramIndexDir: String,
                       baseDir: String, checkpointDir: String,
                       retain: Int = 3, buckets: Int = 64)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val idxPath = new org.apache.hadoop.fs.Path(gramIndexDir)
              val fs = idxPath.getFileSystem(
                spark.sparkContext.hadoopConfiguration)
              val known =
                if (fs.exists(idxPath))
                  spark.read.parquet(gramIndexDir)
                    .select("sh", "first_window")
                else spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  StructType(Seq(
                    org.apache.spark.sql.types.StructField("sh",
                      org.apache.spark.sql.types.LongType),
                    org.apache.spark.sql.types.StructField("first_window",
                      org.apache.spark.sql.types.TimestampType))))
              val metrics = graft.streaming.Jobs
                .noveltyPerWindow(pinned, known)
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                NoveltyAuditSchema, retain)
              val b = readBucketCount(spark, gramIndexDir)
                .getOrElse(buckets)
              // first-seen delta: grams this batch introduced, stamped
              // with their attributed window; materialized so the
              // append never scans its own output
              val delta = pinned.groupBy("sh")
                .agg(min(col("window_start")).as("first_window"))
                .join(known.select("sh"), Seq("sh"), "left_anti")
                .withColumn("__bucket", pmod(col("sh"), lit(b.toLong)))
                .localCheckpoint(eager = true)
              try {
                if (!delta.isEmpty) {
                  alignToPartitions(delta, "__bucket")
                    .write.mode("append")
                    .partitionBy("__bucket").parquet(gramIndexDir)
                  if (readBucketCount(spark, gramIndexDir).isEmpty)
                    writeBucketCount(spark, gramIndexDir, b)
                }
              } finally graft.operators.Checkpoints.drop(delta)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[noveltyBySourceAuditSink]] store: one
    * novelty row per finalized (ingest window, source) plus the
    * changelog bookkeeping columns. `wkey` is the synthesized composite
    * upsert key (`<window epoch ms>|<source>` — the versioned merge
    * keys on one column; the key is a pure function of the row's own
    * grain, so replays regenerate it identically). */
  val NoveltyBySourceAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("wkey", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_grams", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_novel", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("novelty_ppm", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted per-(window, source) NOVELTY monitor — the WHO twin of
    * [[noveltyAuditSink]]'s WHEN (the live `q_novelty_by_source`,
    * VERDICT r14 #4): finalized
    * [[graft.streaming.Jobs.windowedGramSourceDocFreq]] micro-batches
    * fold through [[graft.streaming.Jobs.noveltyBySourcePerWindow]]
    * against the SAME persisted first-seen gram index layout
    * (`(sh, first_window)`, `__bucket=pmod(sh, buckets)` — a store
    * seeded by [[graft.operators.Dedup.writeGramIndex]] or by the WHEN
    * sink is readable here as-is), upsert into the versioned snapshot
    * keyed by the synthesized `wkey`, then append the batch's first-seen
    * grams as an anti-join delta (cost ∝ NEW grams). SINGLE-WRITER
    * DISCIPLINE: exactly one novelty sink may own a gram index dir —
    * this sink SUBSUMES the WHEN monitor (rolling its store over
    * `source` per window reproduces [[noveltyAuditSink]]'s rows — the
    * conservation law pinned in StreamingSpec), so deployments wanting
    * both signals run this one and derive WHEN by rollup rather than
    * double-appending one index.
    *
    * Takedown position and replay semantics are [[noveltyAuditSink]]'s,
    * verbatim: the index is a doc-unattributed one-way-hash census
    * (rebuild, not per-doc delete); committed batches replay as no-ops
    * via the marker, torn batches re-derive identical decisions because
    * attribution is a pure function of min(first_window) / min(min_doc). */
  def noveltyBySourceAuditSink(hist: DataFrame, gramIndexDir: String,
                               baseDir: String, checkpointDir: String,
                               retain: Int = 3, buckets: Int = 64)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val idxPath = new org.apache.hadoop.fs.Path(gramIndexDir)
              val fs = idxPath.getFileSystem(
                spark.sparkContext.hadoopConfiguration)
              val known =
                if (fs.exists(idxPath))
                  spark.read.parquet(gramIndexDir)
                    .select("sh", "first_window")
                else spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  StructType(Seq(
                    org.apache.spark.sql.types.StructField("sh",
                      org.apache.spark.sql.types.LongType),
                    org.apache.spark.sql.types.StructField("first_window",
                      org.apache.spark.sql.types.TimestampType))))
              val metrics = graft.streaming.Jobs
                .noveltyBySourcePerWindow(pinned, known)
                .withColumn("wkey", concat(
                  (col("window_start").cast("double") * 1000).cast("long")
                    .cast("string"), lit("|"), col("source")))
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "wkey",
                NoveltyBySourceAuditSchema, retain)
              val b = readBucketCount(spark, gramIndexDir)
                .getOrElse(buckets)
              // first-seen delta: grams this batch introduced, stamped
              // with their attributed window; materialized so the
              // append never scans its own output
              val delta = pinned.groupBy("sh")
                .agg(min(col("window_start")).as("first_window"))
                .join(known.select("sh"), Seq("sh"), "left_anti")
                .withColumn("__bucket", pmod(col("sh"), lit(b.toLong)))
                .localCheckpoint(eager = true)
              try {
                if (!delta.isEmpty) {
                  alignToPartitions(delta, "__bucket")
                    .write.mode("append")
                    .partitionBy("__bucket").parquet(gramIndexDir)
                  if (readBucketCount(spark, gramIndexDir).isEmpty)
                    writeBucketCount(spark, gramIndexDir, b)
                }
              } finally graft.operators.Checkpoints.drop(delta)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[dupRateAuditSink]] store: one exact-dup
    * rate row per finalized ingest window plus changelog bookkeeping. */
  val DupRateAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_dup", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dup_ppm", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live DUPLICATION-RATE monitor — the fifth corpus-audit
    * monitor (contamination, boilerplate, novelty, TTR, exact-dup rate):
    * finalized [[graft.streaming.Jobs.windowedFpCounts]] micro-batches
    * fold through [[graft.streaming.Jobs.dupRatePerWindow]] against a
    * persisted FIRST-SEEN fingerprint index ((fp, first_window),
    * `__bucket = pmod(xxhash64(fp), buckets)` — the exact-dedup
    * fingerprint-index bucketing with the gram index's first-seen
    * stamp), upsert into the versioned metrics store, then append the
    * batch's first-seen fingerprints as an anti-join delta (cost ∝ NEW
    * contents, never fp history). The monitor complements the exact-
    * dedup ingest GATE: the gate decides admission on a pipeline that
    * already committed to dedup; this measures duplication arriving on
    * a raw stream — the number that justifies turning the gate on.
    *
    * Takedown position: like the gram index, the fp index here is a
    * one-way-hash census with no doc attribution (fp → first_window) —
    * doc-level opt-out rides the doc-attributed artifacts; rebuild (or
    * the counted-ledger pattern) is the census-level remedy.
    *
    * Replay semantics are [[noveltyAuditSink]]'s verbatim: committed
    * batches replay as marker no-ops; torn batches re-derive identical
    * decisions because attribution is a pure function of
    * min(first_window), and the delta anti-join lands empty. */
  def dupRateAuditSink(hist: DataFrame, fpIndexDir: String,
                       baseDir: String, checkpointDir: String,
                       retain: Int = 3, buckets: Int = 64)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val idxPath = new org.apache.hadoop.fs.Path(fpIndexDir)
              val fs = idxPath.getFileSystem(
                spark.sparkContext.hadoopConfiguration)
              val known =
                if (fs.exists(idxPath))
                  spark.read.parquet(fpIndexDir)
                    .select("fp", "first_window")
                else spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  StructType(Seq(
                    org.apache.spark.sql.types.StructField("fp",
                      org.apache.spark.sql.types.StringType),
                    org.apache.spark.sql.types.StructField("first_window",
                      org.apache.spark.sql.types.TimestampType))))
              val metrics = graft.streaming.Jobs
                .dupRatePerWindow(pinned, known)
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                DupRateAuditSchema, retain)
              val b = readBucketCount(spark, fpIndexDir)
                .getOrElse(buckets)
              // first-seen delta: contents this batch introduced, stamped
              // with their attributed window; materialized so the append
              // never scans its own output
              val delta = pinned.groupBy("fp")
                .agg(min(col("window_start")).as("first_window"))
                .join(known.select("fp"), Seq("fp"), "left_anti")
                .withColumn("__bucket",
                  pmod(xxhash64(col("fp")), lit(b.toLong)))
                .localCheckpoint(eager = true)
              try {
                if (!delta.isEmpty) {
                  alignToPartitions(delta, "__bucket")
                    .write.mode("append")
                    .partitionBy("__bucket").parquet(fpIndexDir)
                  if (readBucketCount(spark, fpIndexDir).isEmpty)
                    writeBucketCount(spark, fpIndexDir, b)
                }
              } finally graft.operators.Checkpoints.drop(delta)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** TAKEDOWN verb for the [[windowedMetricsStoreSink]] store — drop
    * retired windows from the live view, completing the artifact's verb
    * set (sink / time-travel read / GC / delete; VERDICT r11 #5). The
    * delete is a changelog commit, not a rewrite: matching LIVE windows
    * get `op="d"` tombstones carrying the window's own `ts_ms` (the
    * store's changelog ordering is a pure function of the data —
    * tombstones must be too), and [[graft.streaming.Cdc.applyChangelog]]
    * ranks a delete above an update at the same instant, so a replayed
    * upsert of a taken-down window can never resurrect it. That
    * suppression is deliberately PERMANENT, not just replay-scoped:
    * every sink upsert of a window carries the same data-derived
    * `ts_ms = window_start·1000`, so genuinely NEW late events for a
    * taken-down window are also outranked by the tombstone — a takedown
    * means "this window's metrics must not reappear", and late
    * stragglers trickling it back would violate exactly that. A window
    * becomes re-ingestable only after its tombstone ages past the
    * retention horizon and [[graft.streaming.Cdc.compactTombstones]]
    * drops it (the store's GC pass) — the deliberate, operator-driven
    * path back, not an accidental one. REPLAY
    * NO-OP without markers: requested windows are semi-joined against
    * the live view first, so a repeated delete finds nothing live,
    * commits NO new version, and the retained `v=<n>` chain is
    * byte-identical (the takedownSink idempotence discipline).
    * Returns the number of windows tombstoned. */
  def deleteFromWindowedMetricsStore(spark: SparkSession, baseDir: String,
                                     windows: DataFrame,
                                     retain: Int = 3): Long = {
    val versions = snapshotVersions(spark, baseDir)
    if (versions.isEmpty) return 0L
    val live = graft.streaming.Cdc.liveView(
      readSnapshotVersion(spark, baseDir, versions.last,
        WindowedMetricsSchema))
    val doomed = live.select(col("window_start"))
      .join(windows.select(col("window_start")).distinct(),
        Seq("window_start"), "left_semi")
      .localCheckpoint(eager = true) // window-count-sized, consumed twice
    try {
      val n = doomed.count()
      if (n > 0) {
        val tombstones = doomed
          .withColumn("n_pos", lit(null).cast("long"))
          .withColumn("n_neg", lit(null).cast("long"))
          .withColumn("auc", lit(null).cast("double"))
          .withColumn("avg_prec", lit(null).cast("double"))
          .withColumn("op", lit("d"))
          .withColumn("ts_ms",
            (col("window_start").cast("double") * 1000).cast("long"))
        versionedUpsertBatch(tombstones, baseDir, "window_start",
          WindowedMetricsSchema, retain)
      }
      n
    } finally graft.operators.Checkpoints.drop(doomed)
  }

  /** Snapshot schema of the [[mixDriftAuditSink]] store: one language-
    * mix drift row per finalized (window, source) plus changelog
    * bookkeeping. `kl_pico` is null (and `n_unseen` > 0 carries the doc
    * count) when the window's languages fall wholly outside the
    * baseline support — the unseen-language-flood alarm row. */
  val MixDriftAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("wkey", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("kl_pico", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_unseen", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live MIX-DRIFT monitor — the SIXTH corpus-audit monitor
    * (contamination, boilerplate, novelty, TTR, exact-dup rate,
    * language-mix drift): finalized
    * [[graft.streaming.Jobs.windowedLangCounts]] micro-batches fold
    * through [[graft.streaming.Jobs.mixDriftPerWindow]] against the
    * BASELINE language marginal persisted at `baselineDir` ((lang, n_l,
    * n_total) — the trained corpus's mix), upserting one (window,
    * source) KL row into the versioned metrics store via the
    * synthesized `wkey` (the noveltyBySourceAuditSink key convention).
    * The baseline is RE-READ per micro-batch (the decontaminateSpanSink
    * probe convention): retraining the reference mix tightens the
    * monitor without a restart. No index of its own — the monitor is
    * stateless beyond the metrics store, the cheapest of the six
    * (dimension-sized state, no text read). An unseen-language flood
    * (every doc of a (window, source) outside the baseline support)
    * lands as a kl_pico-null row with `n_unseen` carrying the doc
    * count — the store records the strongest drift instead of dropping
    * it (ADVICE r15).
    *
    * Replay semantics: committed batches replay as marker no-ops; a
    * torn batch (no index append exists to tear) re-derives identical
    * rows because the fold is a pure function of (batch, baseline). */
  def mixDriftAuditSink(hist: DataFrame, baselineDir: String,
                        baseDir: String, checkpointDir: String,
                        retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          val spark = batch.sparkSession
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val baseline = spark.read.parquet(baselineDir)
                .select("lang", "n_l", "n_total")
              val metrics = graft.streaming.Jobs
                .mixDriftPerWindow(pinned, baseline)
                .withColumn("wkey", concat(
                  (col("window_start").cast("double") * 1000).cast("long")
                    .cast("string"), lit("|"), col("source")))
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "wkey",
                MixDriftAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[qualityAuditSink]] store: one DSIR-weight
    * quality row per finalized (window, source) plus changelog
    * bookkeeping. */
  val QualityAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("wkey", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("weight_pico", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("mean_pico_per_token", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live QUALITY monitor — the SEVENTH corpus-audit monitor:
    * finalized [[graft.streaming.Jobs.windowedQualitySums]]
    * micro-batches fold through
    * [[graft.streaming.Jobs.qualityPerWindow]] and upsert one (window,
    * source) DSIR-weight row into the versioned metrics store via the
    * synthesized `wkey` (the mixDriftAuditSink shape — stateless beyond
    * the store; the LM refresh rides the stream-static join inside the
    * windowed relation itself, so this sink has nothing to re-read).
    * The monitor-and-gate pairing: a source whose mean per-token weight
    * drifts toward the [[dsirGateSink]] threshold is about to lose
    * admission rate — the store's window history is the early-warning
    * curve. Replay: committed batches are marker no-ops; the fold is a
    * pure function of the batch. */
  def qualityAuditSink(hist: DataFrame, baseDir: String,
                       checkpointDir: String, retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs.qualityPerWindow(pinned)
                .withColumn("wkey", concat(
                  (col("window_start").cast("double") * 1000).cast("long")
                    .cast("string"), lit("|"), col("source")))
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "wkey",
                QualityAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[diversityAuditSink]] store: one semantic-
    * diversity census row per finalized window plus changelog
    * bookkeeping. */
  val DiversityAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_vecs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_buckets", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("entropy_pico", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("max_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("min_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live DIVERSITY monitor — the EIGHTH corpus-audit monitor
    * (contamination, boilerplate, novelty, TTR, exact-dup rate, mix
    * drift, quality, semantic diversity; VERDICT r15 #2): finalized
    * [[graft.streaming.Jobs.windowedBucketCounts]] micro-batches fold
    * through [[graft.streaming.Jobs.bucketEntropyPerWindow]] — the
    * `q_bucket_entropy` pico-quantized census, window grain — and
    * upsert one row per window into the versioned metrics store (the
    * dupRateAuditSink key convention: window_start). The monitor-and-
    * gate pairing: a falling entropy curve (or a spiking max_bucket)
    * says the crawl is pooling in one semantic region — the reading
    * that justifies turning [[diversityGateSink]]'s cap on, read from
    * the store's window history BEFORE the mixture skews. Stateless
    * beyond the store; replay: committed batches are marker no-ops, and
    * the fold is a pure function of the batch. */
  def diversityAuditSink(hist: DataFrame, baseDir: String,
                         checkpointDir: String, retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs
                .bucketEntropyPerWindow(pinned)
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                DiversityAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[diversityBySourceAuditSink]] store: one
    * semantic-diversity census row per finalized (window, source) plus
    * changelog bookkeeping. */
  val DiversityBySourceAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("wkey", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_vecs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_buckets", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("entropy_pico", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("max_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("min_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live by-source DIVERSITY monitor — the WHO twin of
    * [[diversityAuditSink]] (the noveltyBySourceAuditSink convention):
    * finalized [[graft.streaming.Jobs.windowedBucketCountsBySource]]
    * micro-batches fold through
    * [[graft.streaming.Jobs.bucketEntropyBySourcePerWindow]] and upsert
    * one (window, source) entropy row via the synthesized `wkey`. The
    * per-window store says the corpus is pooling; this store says WHICH
    * source's crawler is stuck in one semantic region — the
    * mixture-weight lever. Stateless beyond the store; replay:
    * committed batches are marker no-ops, the fold is a pure function
    * of the batch. */
  def diversityBySourceAuditSink(hist: DataFrame, baseDir: String,
                                 checkpointDir: String, retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs
                .bucketEntropyBySourcePerWindow(pinned)
                .withColumn("wkey", concat(
                  (col("window_start").cast("double") * 1000).cast("long")
                    .cast("string"), lit("|"), col("source")))
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "wkey",
                DiversityBySourceAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())

  /** Snapshot schema of the [[spectralDriftAuditSink]] store: one
    * spectral-drift census row per finalized window plus changelog
    * bookkeeping. */
  val SpectralDriftAuditSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("window_start", org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("n_vecs", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_buckets", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tv_ppm", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("max_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("min_bucket", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType)))

  /** Persisted live SPECTRAL-DRIFT monitor — the NINTH corpus-audit
    * monitor (…, semantic diversity, by-source diversity, spectral
    * drift): finalized
    * [[graft.streaming.Jobs.windowedProjBuckets]] micro-batches fold
    * through [[graft.streaming.Jobs.spectralDriftPerWindow]] — the
    * per-window projection histogram against a FROZEN
    * [[graft.operators.Spectral.writeDirection]] reference axis, plus
    * its total-variation distance to the reference histogram in ppm —
    * and upsert one row per window into the versioned metrics store.
    * The monitor-and-eval pairing: the LSH diversity census says WHICH
    * region pools; this says the embedding DISTRIBUTION itself is
    * sliding off the axis the reference corpus (and every IVF index /
    * semantic gate fit on it) assumed — the re-fit/re-train trigger,
    * read from window history. The artifact is read ONCE at sink
    * construction (immutable by contract — a refit is a NEW artifact +
    * a new sink). Stateless beyond the store; replay: committed batches
    * are marker no-ops, the fold is a pure function of the batch. */
  def spectralDriftAuditSink(hist: DataFrame, artifactDir: String,
                             baseDir: String, checkpointDir: String,
                             retain: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val (_, _, _, _, ref, refN) = graft.operators.Spectral
      .readDirection(hist.sparkSession, artifactDir)
    hist.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$baseDir/_markers") {
        (batch: DataFrame, _: Long) =>
          // pin BEFORE the empty check (commits the stateful operator's
          // state stores — the windowedMetricsStoreSink discipline)
          val pinned = batch.localCheckpoint(eager = true)
          try {
            if (!pinned.isEmpty) {
              val metrics = graft.streaming.Jobs
                .spectralDriftPerWindow(pinned, ref, refN)
                .withColumn("op", lit("u"))
                .withColumn("ts_ms",
                  (col("window_start").cast("double") * 1000).cast("long"))
              versionedUpsertBatch(metrics, baseDir, "window_start",
                SpectralDriftAuditSchema, retain)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
      })
      .trigger(Trigger.AvailableNow())
  }

  /** RETENTION verb for the [[windowedMetricsStoreSink]] store: tombstone
    * every live window strictly older than `cutoff` — the TTL policy a
    * metrics store needs once windows stop being queried (the
    * [[expirePartitions]] analog for a versioned-snapshot artifact; the
    * version chain itself is already GC'd by `retain`). Delegates to
    * [[deleteFromWindowedMetricsStore]], so it inherits the replay
    * no-op and no-resurrection laws. Returns the windows expired. */
  def expireWindowedMetrics(spark: SparkSession, baseDir: String,
                            cutoff: java.sql.Timestamp,
                            retain: Int = 3): Long = {
    val versions = snapshotVersions(spark, baseDir)
    if (versions.isEmpty) return 0L
    val old = graft.streaming.Cdc.liveView(
        readSnapshotVersion(spark, baseDir, versions.last,
          WindowedMetricsSchema))
      .filter(col("window_start") < lit(cutoff))
      .select(col("window_start"))
    deleteFromWindowedMetricsStore(spark, baseDir, old, retain)
  }

  /** Complete snapshot versions under `baseDir`, ascending. */
  def snapshotVersions(spark: SparkSession, baseDir: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v=") &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          scala.util.Try(n.drop(2).toLong).toOption
        else None
      }.sorted
  }

  /** Time-travel read of one retained snapshot version. */
  def readSnapshotVersion(spark: SparkSession, baseDir: String, version: Long,
                          schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(f"$baseDir/v=$version%05d")

  /** Incremental keyed upsert sink — the large-table path next to
    * [[upsertSink]] (which re-merges and rewrites the FULL snapshot every
    * micro-batch: fine for dim-sized tables, O(snapshot) I/O + shuffle per
    * batch anywhere else). Here the snapshot is hash-bucketed by key into
    * `numBuckets` parquet partitions (`__bucket=<b>/`); each micro-batch
    *
    *   1. computes the bucket set its keys touch (≤ numBuckets ints),
    *   2. reads ONLY those bucket partitions (partition-pruned scan),
    *   3. merges with [[graft.streaming.Cdc.applyChangelog]], and
    *   4. rewrites ONLY those partitions via dynamic partition overwrite.
    *
    * Per-batch cost is O(batch + touched buckets), independent of
    * snapshot size. `numBuckets` is fixed for the life of a snapshot
    * (changing it requires a one-off full rewrite); size it so one bucket
    * ≈ a comfortable task unit (e.g. 4 096 buckets for a 1 TB snapshot).
    *
    * Crash safety: dynamic overwrite stages files and swaps at job
    * commit; if a batch dies mid-write the checkpoint has not committed,
    * and re-running the batch converges to an equivalent snapshot — the
    * LWW merge is idempotent, though a replay at a later wall-clock time
    * may additionally compact tombstones the original write kept
    * (`compactTombstones` is driven by now-time; both outcomes are
    * inside the replay horizon's safety contract). */
  def bucketedUpsertSink(df: DataFrame, snapshotDir: String,
                         checkpointDir: String, keyCol: String,
                         snapshotSchema: StructType, numBuckets: Int,
                         compactHorizonMs: Option[Long] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    require(numBuckets > 0, "numBuckets must be positive")
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val bucketOf = pmod(hash(col(keyCol)), lit(numBuckets))
        // distinct buckets this batch touches: bounded by numBuckets,
        // so the collect is a fixed-size driver-side set, never data-scale
        val touched = batch.select(bucketOf.as("__bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (touched.nonEmpty) {
          val dst = new org.apache.hadoop.fs.Path(snapshotDir)
          val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // a snapshot dir that exists but holds no bucket partitions
          // (every bucket compacted to empty, or only _SUCCESS left) has
          // no schema to infer — treat it exactly like the no-dir branch
          val hasBuckets = fs.exists(dst) &&
            fs.listStatus(dst).exists(_.getPath.getName.startsWith("__bucket="))
          val existing =
            if (hasBuckets)
              // filter on the partition column prunes to the touched
              // bucket directories at the FileIndex — untouched buckets
              // are never listed, opened, or shuffled
              spark.read.parquet(snapshotDir)
                .filter(col("__bucket").isin(touched: _*))
                .select(snapshotSchema.fieldNames.toSeq.map(col): _*)
            else
              spark.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](), snapshotSchema)
          val upserted = graft.streaming.Cdc.applyChangelog(existing, batch, keyCol)
          // opportunistic tombstone compaction: the touched buckets are
          // being rewritten anyway, so expiring dead tombstones here is
          // free — untouched buckets compact whenever they next merge
          val merged = compactHorizonMs.fold(upserted)(h =>
            graft.streaming.Cdc.compactTombstones(upserted, h,
              System.currentTimeMillis()))
          // materialize the merge BEFORE the overwrite: the merged plan
          // reads the same path it is about to write (Spark rejects that
          // read-write cycle, and lazily it would be a correctness bug).
          // localCheckpoint pins the touched-bucket rows — bounded by
          // design at a few task-units — to executor storage and cuts
          // the lineage back to a LogicalRDD.
          val pinned = merged.withColumn("__bucket", bucketOf)
            .localCheckpoint(eager = true)
          try {
            // dynamic mode replaces exactly the partitions present in the
            // output — the touched buckets — and leaves the rest in place
            alignToPartitions(pinned, "__bucket")
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("__bucket")
              .parquet(snapshotDir)
            // a touched bucket whose merge compacted to EMPTY is absent
            // from the output, so dynamic overwrite left its old files in
            // place — drop those directories explicitly
            val written = pinned.select("__bucket").distinct()
              .collect().map(_.getInt(0)).toSet
            touched.filterNot(written).foreach { b =>
              fs.delete(
                new org.apache.hadoop.fs.Path(s"$snapshotDir/__bucket=$b"), true)
            }
          } finally graft.operators.Checkpoints.drop(pinned)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
  }

  /** Read the live rows of a bucketed snapshot written by
    * [[bucketedUpsertSink]] (partition column dropped, tombstones kept —
    * pipe through [[graft.streaming.Cdc.liveView]] to drop them). */
  def readBucketedSnapshot(spark: SparkSession, snapshotDir: String,
                           snapshotSchema: StructType): DataFrame =
    spark.read.parquet(snapshotDir)
      .select(snapshotSchema.fieldNames.toSeq.map(col): _*)

  /** Small-files compaction for a parquet directory — the steady-state
    * maintenance op every incremental sink here (append, upsert, IVF
    * index, streaming micro-batches) eventually needs: thousands of
    * kilobyte-sized files turn a 100 TB scan into a file-open storm,
    * bloat the driver's file index, and shred min/max pruning. Rewrites
    * the directory into ⌈bytes / targetFileBytes⌉ files with `coalesce`
    * (narrow — no shuffle; rows merge along existing file order, so a
    * sorted layout stays sorted), then swaps atomically via the same
    * write-tmp → bak → rename dance as [[upsertSink]]: readers never see
    * a moment without a complete snapshot, and a crash leaves either the
    * old or the new directory intact. Single-writer by contract, like
    * all snapshot maintenance in this pack. Returns the output file
    * count. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(dst).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "_bak")
    // the read of `dir` completes while writing _tmp — the swap below
    // only runs after the write action finished
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"compactParquet: $what failed")
    fs.delete(bak, true)
    must(fs.rename(dst, bak), s"rename $dst -> $bak")
    must(fs.rename(tmp, dst), s"rename $tmp -> $dst")
    fs.delete(bak, true)
    n
  }

  // ---- partitioned-dir maintenance: census / compact / expire -------
  //
  // [[compactParquet]] rewrites a WHOLE directory — O(table), fine for
  // snapshot-sized dirs. The hive-partitioned artifacts (fingerprint /
  // near-dup indexes and the components store on `__bucket=`, the IVF
  // index on `ivf_list=`, date-partitioned ingest on `<col>=`)
  // accumulate files per partition through their APPEND verbs and need
  // the fragmentation-proportional form: census file counts from
  // metadata alone, rewrite ONLY partitions above threshold, leave the
  // rest byte-identical. Same single-writer contract as every snapshot
  // maintenance op in this pack.

  /** Align write tasks to storage partitions: hash-repartition on the
    * partition column so a `partitionBy(partCol)` write lays ONE file
    * per partition directory instead of one per (task × partition) —
    * without this, a 32-task write into 64 buckets can fan out to ~2k
    * kilobyte files in a single commit, the small-file storm
    * [[compactPartitionedDir]] exists to repair. The shuffle moves only
    * the relation being written (batch-sized on every incremental
    * path), far cheaper than the file-creation storm it prevents. */
  def alignToPartitions(df: DataFrame, partCol: String): DataFrame =
    df.repartition(col(partCol))

  /** Delete the `partCol=v` directories of buckets that were touched by
    * a rewrite but absent from its output — dynamic partition overwrite
    * only replaces partitions PRESENT in the written data, so a bucket
    * emptied by a delete/move would silently keep its stale files. The
    * shared guard of every partitioned-index TAKEDOWN verb (fingerprint,
    * fp-first-seen, near-dup, winnow, bucket-membership, components —
    * one definition, ADVICE r16). If the drop leaves NO partition
    * directories at all, the artifact dir itself (sidecars included) is
    * removed: an index emptied by takedown must revert to the
    * documented COLD-START state ("no index yet"), not linger as a
    * sidecar-only dir whose consumers' exists()-then-read dies with
    * UNABLE_TO_INFER_SCHEMA (ADVICE r16 — the diversityGateSink /
    * dupRateAuditSink read shape). delete-all == rebuild-from-nothing,
    * which the empty-seed guards make "no dir". */
  private[graft] def dropEmptiedPartitions(spark: SparkSession, dir: String,
                                           partCol: String,
                                           touched: Seq[Long],
                                           written: Set[Long]): Unit = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(written).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"$partCol=$b"), true)
    }
    if (fs.exists(base) &&
        !fs.listStatus(base).exists(_.getPath.getName.startsWith(s"$partCol=")))
      fs.delete(base, true)
  }

  /** Remove an artifact directory — the empty-seed guards' revert verb:
    * seeding an index from an EMPTY corpus means "index of nothing",
    * and the documented representation of that state is a missing dir
    * (cold start), never a schema-less or stale one. */
  private[graft] def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Write-then-swap a SMALL derived relation (a census, a pointer) so
    * there is never a moment without a readable copy — the [[upsertSink]]
    * swap discipline as a reusable verb: write `<dir>_tmp` → move the
    * current dir to `<dir>_bak` → move `_tmp` in → drop `_bak`. A crash
    * between the renames leaves `_bak`, which [[readSwapped]] recovers.
    * `coalesce(1)`: callers pass driver-bounded relations (≤ a few
    * hundred rows) — one file, not one per shuffle partition. */
  private[graft] def swapWrite(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "_bak")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"swapWrite: $what failed")
    fs.delete(bak, true)
    if (fs.exists(dst)) must(fs.rename(dst, bak), s"rename $dst -> $bak")
    must(fs.rename(tmp, dst), s"rename $tmp -> $dst")
    fs.delete(bak, true)
  }

  /** Read a [[swapWrite]]-maintained relation, recovering from a crash
    * mid-swap: the current dir if present, else the `_bak` the torn swap
    * left. None = the artifact was never written (cold start). */
  private[graft] def readSwapped(spark: SparkSession,
                                 dir: String): Option[DataFrame] = {
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(dir + "_bak")
    if (fs.exists(dst)) Some(spark.read.parquet(dir))
    else if (fs.exists(bak)) Some(spark.read.parquet(bak.toString))
    else None
  }

  /** Record the bucket count a hash-bucketed artifact was written with —
    * a dot-prefixed sidecar (invisible to readers, like the compaction
    * scratch dirs). The count is part of the LAYOUT: every later append
    * or delete must route rows with the same `pmod(hash, n)`, so the
    * writer pins it here and the other verbs discover it instead of
    * trusting their caller to repeat the right number. */
  def writeBucketCount(spark: SparkSession, dir: String, n: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, ".bucket_count")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Stamp a persisted artifact's layout version (`.layout_version`
    * sidecar). A layout version changes when the ON-DISK semantics of
    * stored values change — e.g. round 12's minhash hash-family move
    * (xxhash64 → engine-portable md5), which re-keys every band bucket:
    * appending new-hash rows to an old-hash index would silently never
    * match, so the verbs check this stamp and fail loudly instead. */
  def writeLayoutVersion(spark: SparkSession, dir: String, v: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, ".layout_version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The stamped layout version of a persisted artifact, if recorded
    * (pre-stamp artifacts return None — treat as an older layout). A
    * TORN sidecar (exists but empty/unparseable — `fs.create` committed,
    * payload lost) also reads as None: the verbs then raise their
    * standard "stale layout — rebuild the index" error instead of an
    * opaque StringIndexOutOfBoundsException, which is the right failure
    * for a stamp whose whole job is to say "rebuild me" when unsure. */
  def readLayoutVersion(spark: SparkSession, dir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir, ".layout_version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else readIntSidecar(fs, p)
  }

  /** Read a small integer sidecar; an EMPTY or unparseable file — the
    * torn-write state where `fs.create` succeeded but the payload write
    * was lost — yields None instead of the
    * StringIndexOutOfBoundsException `new String(buf, 0, -1)` used to
    * throw, so callers decide the failure mode instead of dying on an
    * opaque bounds error. */
  private def readIntSidecar(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): Option[Int] = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](32)
      val k = in.read(buf)
      if (k <= 0) None
      else scala.util.Try(new String(buf, 0, k, "UTF-8").trim.toInt).toOption
    } finally in.close()
  }

  /** The pinned bucket count of a bucketed artifact, if recorded. A
    * sidecar that EXISTS but is torn (empty/unparseable) fails loudly:
    * unlike the layout stamp, there is no safe default — guessing a
    * bucket count mis-routes every subsequent append. */
  def readBucketCount(spark: SparkSession, dir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir, ".bucket_count")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else readIntSidecar(fs, p) match {
      case some @ Some(_) => some
      case None => throw new IllegalStateException(
        s"$p exists but is empty or unparseable (torn sidecar write): " +
          "the artifact's bucket layout is unknowable — re-stamp it with " +
          "writeBucketCount(<the count the artifact was built with>) or " +
          "rebuild the artifact")
    }
  }

  /** One partition's file-level stats — from directory metadata only,
    * data never opened. */
  case class PartitionCensus(partition: String, files: Int, bytes: Long)

  /** File census of every `<partPrefix>=<value>` partition under `dir`:
    * one `listStatus` per partition, no data reads — the fragmentation
    * trigger feeding [[compactPartitionedDir]] (the census → trigger →
    * rewrite discipline the IVF drift lifecycle uses). */
  def partitionCensus(spark: SparkSession, dir: String,
                      partPrefix: String): Seq[PartitionCensus] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partPrefix + "="))
      .map { st =>
        val data = fs.listStatus(st.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        PartitionCensus(st.getPath.getName, data.length, data.map(_.getLen).sum)
      }
      .sortBy(_.partition)
  }

  /** Fragmentation-proportional compaction of a hive-partitioned
    * parquet dir: partitions whose data-file count exceeds BOTH
    * `maxFilesPerPartition` and their byte-derived target
    * ⌈bytes / targetFileBytes⌉ are rewritten to the target count
    * (narrow `coalesce` — no shuffle) and swapped in per-partition via
    * the write-tmp → bak → rename dance; every other partition is never
    * read, rewritten, or touched (byte-identity law). Idempotent by
    * construction: a compacted partition sits AT its target count, so
    * the trigger cannot re-fire — the second run returns empty and
    * writes nothing.
    *
    * Crash safety (single-writer): each swap is per-partition atomic on
    * rename-atomic filesystems; a crash between the two renames leaves
    * an orphaned `.compact_bak_*` with the live dir missing, which the
    * RECOVERY SWEEP at the next entry restores (stale tmp/bak from
    * completed swaps are dropped). Scratch siblings are DOT-prefixed —
    * specifically not underscore-prefixed: Spark's hidden-path filter
    * exempts `_`-names containing `=` (HadoopFSUtils
    * .shouldFilterOutPathName), so `_bak_day=A` would be readable as a
    * partition, while `.`-names are filtered unconditionally — readers
    * never see scratch state. Returns the compacted partition names. */
  def compactPartitionedDir(spark: SparkSession, dir: String,
                            partPrefix: String,
                            maxFilesPerPartition: Int = 4,
                            targetFileBytes: Long = 128L << 20): Seq[String] = {
    require(maxFilesPerPartition >= 1, "maxFilesPerPartition must be >= 1")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    // recovery sweep: restore any bak whose live partition vanished in
    // a crash window; clear scratch left behind by completed swaps
    fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".compact_tmp_")) fs.delete(st.getPath, true)
      else if (n.startsWith(".compact_bak_")) {
        val live = new org.apache.hadoop.fs.Path(base, n.stripPrefix(".compact_bak_"))
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            throw new java.io.IOException(s"compactPartitionedDir: recovery rename $n failed")
        } else fs.delete(st.getPath, true)
      }
    }
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"compactPartitionedDir: $what failed")
    partitionCensus(spark, dir, partPrefix).flatMap { c =>
      val targetN =
        math.max(1L, (c.bytes + targetFileBytes - 1) / targetFileBytes).toInt
      if (c.files <= maxFilesPerPartition || c.files <= targetN) None
      else {
        val live = new org.apache.hadoop.fs.Path(base, c.partition)
        val tmp = new org.apache.hadoop.fs.Path(base, s".compact_tmp_${c.partition}")
        val bak = new org.apache.hadoop.fs.Path(base, s".compact_bak_${c.partition}")
        // the partition dir reads WITHOUT its partition column (the
        // value lives in the dir name) — exactly the file schema the
        // swapped-in rewrite must carry
        spark.read.parquet(live.toString).coalesce(targetN)
          .write.mode("overwrite").parquet(tmp.toString)
        must(fs.rename(live, bak), s"rename $live -> bak")
        must(fs.rename(tmp, live), s"rename tmp -> $live")
        fs.delete(bak, true)
        Some(c.partition)
      }
    }
  }

  /** Retention/TTL expiry of whole partitions — metadata-only: list the
    * `<partPrefix>=<value>` dirs, drop every one whose VALUE the
    * predicate condemns, never open a data file. The at-scale shape for
    * time-partitioned retention: dropping a 10 TB day costs one
    * recursive delete, not a scan. Idempotent (a dropped partition is
    * gone from the next listing); expire == rebuild-without those
    * partitions because parquet partitions are physically disjoint.
    * Returns the dropped partition dir names. */
  def expirePartitions(spark: SparkSession, dir: String, partPrefix: String,
                       dropValue: String => Boolean): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partPrefix + "="))
      .filter { st =>
        val raw = st.getPath.getName.drop(partPrefix.length + 1)
        // partitionBy URL-encodes reserved chars in partition values
        dropValue(java.net.URLDecoder.decode(raw, "UTF-8"))
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
      .sorted
  }

  /** Streaming append ingest partitioned by `partCol` — the producer of
    * the date-partitioned raw-ingest layout the two maintenance verbs
    * above service: micro-batches append `<partCol>=<v>/part-*.parquet`
    * (touched partitions gain files, nothing rewrites), compaction
    * defragments warm partitions, TTL expiry drops cold ones whole.
    * EXACTLY-ONCE under replay via [[idempotentForeachBatch]]: a
    * redelivered micro-batch appends nothing (append mode makes the
    * marker essential — without it a replay would duplicate rows, the
    * failure the upsert sinks' idempotent merges never see). */
  def partitionedIngestSink(df: DataFrame, dir: String, checkpointDir: String,
                            partCol: String,
                            compactEvery: Option[Int] = None,
                            maxFilesPerPartition: Int = 4)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    require(compactEvery.forall(_ >= 1), "compactEvery must be >= 1")
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentForeachBatch(s"$dir/_markers") {
        (batch: DataFrame, batchId: Long) =>
          graft.sources.IO.alignToPartitions(batch, partCol)
            .write.mode("append").partitionBy(partCol).parquet(dir)
          // in-sink maintenance policy: every k-th batch defragments
          // whatever the appends accumulated — fragmentation-
          // proportional (only partitions above threshold rewrite), and
          // safe under the batch marker (a replayed batch skips the
          // append AND the compact; compaction is idempotent anyway)
          compactEvery.foreach { k =>
            if (batchId % k == k - 1)
              compactPartitionedDir(batch.sparkSession, dir, partCol,
                maxFilesPerPartition)
          }
      })
      .trigger(Trigger.AvailableNow())
  }

  /** Streaming TAKEDOWN: each micro-batch of opt-out docs leaves every
    * attached persisted index — the GDPR/opt-out stream shape
    * completing the round-11 delete lifecycle. The request stream
    * carries (id, text): the fingerprint index is keyed by content
    * hash, so the takedown needs the content (callers enrich from the
    * corpus before its own tombstone lands — corpus deletion itself
    * rides [[bucketedUpsertSink]] CDC `op="d"` rows, not this sink).
    *
    * EXACTLY-ONCE without markers: both delete verbs locate their
    * touched partitions by (semi-)joining the request against the live
    * index, so a replayed batch finds nothing and writes nothing — the
    * idempotence is in the verbs (ScalePathSpec replay laws), not in
    * bookkeeping. */
  def takedownSink(requests: DataFrame, checkpointDir: String,
                   idCol: String, textCol: String,
                   fpIndexDir: Option[String] = None,
                   nearDupIndexDir: Option[String] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    requests.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one consume feeds both verbs (and commits the batch's plan)
        val pinned = batch.localCheckpoint(eager = true)
        try {
          fpIndexDir.foreach(d => graft.operators.Dedup
            .deleteFromFingerprintIndex(pinned, textCol, d))
          nearDupIndexDir.foreach(d => graft.operators.Dedup
            .deleteFromNearDupIndex(pinned.select(col(idCol)), idCol, d))
        } finally graft.operators.Checkpoints.drop(pinned)
        ()
      }
      .trigger(Trigger.AvailableNow())

  // ---- round-trip helpers -------------------------------------------

  /** Bucketed + sorted table write — the co-located-join layout: both
    * sides of a recurring equi-join written with the SAME bucket count
    * and key hash-partition identically on disk, so the join plans with
    * ZERO exchanges (and zero sorts, since each bucket file is sorted
    * by the key). This is the bucketing lever from SURVEY §4.2: at
    * 100 TB the shuffle this removes is the dominant cost of every
    * fact⋈fact join. External table (explicit `path`) so the data
    * outlives the catalog entry and lands where the caller says. */
  def writeBucketedTable(df: DataFrame, table: String, path: String,
                         bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
