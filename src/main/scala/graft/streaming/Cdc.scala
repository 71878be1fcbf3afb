package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC changelog handling — the reference's Debezium/MySQL-CDC surface
  * (reference `pom.xml:159-162`): rows shaped
  * `{op: c|u|d|r, before, after, source.table, ts_ms}` applied to a keyed
  * dimension snapshot with last-writer-wins semantics (SURVEY.md §2.I
  * "CDC apply / upsert"; the HBase put/delete sink collapses to a keyed
  * snapshot merge).
  */
object Cdc {

  /** Debezium-style envelope schema over JSON payload strings; `before` /
    * `after` stay as raw JSON strings so the payload schema can be
    * late-bound per table (the reference's dynamic-JSON model,
    * SURVEY.md §1.1). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", StructType(Seq(StructField("table", StringType)))),
    StructField("ts_ms", LongType)))

  /** Parse a stream/batch of raw JSON changelog strings into the envelope.
    * Malformed JSON → null fields → filtered (the DWD dirty-data drop). */
  def parseEnvelope(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.select(from_json(col(jsonCol), envelopeSchema).as("e"))
      .select(col("e.op").as("op"), col("e.before").as("before"),
        col("e.after").as("after"), col("e.source.table").as("table"),
        col("e.ts_ms").as("ts_ms"))
      .filter(col("op").isNotNull && col("ts_ms").isNotNull)

  /** Route changelog rows by table whitelist — the reference's broadcast
    * config-state pattern (DIM app): `config` is a small (table → keep)
    * relation broadcast to every task. */
  def routeByConfig(changelog: DataFrame, config: DataFrame,
                    tableCol: String = "table"): DataFrame =
    changelog.join(broadcast(config), Seq(tableCol), "left_semi")

  /** Apply a changelog to a keyed snapshot, last-writer-wins by (ts_ms,
    * deterministic tie-break): for each key the globally latest event —
    * across BOTH the incoming batch and what the snapshot already holds —
    * determines the row.
    *
    * The snapshot retains delete tombstones (`op='d'` rows): without
    * them, a late event older than a delete would resurrect the key in a
    * later micro-batch, and a late update older than the stored version
    * would overwrite it. Read live rows through [[liveView]]. Compact
    * tombstones out once their ts_ms is older than the replay horizon.
    *
    * Pure DataFrame merge — one shuffle on the key — usable both as a
    * batch replay and inside `foreachBatch` against the running snapshot.
    * `changelog` must carry (keyCol, op, ts_ms, payload columns ⊇ the
    * snapshot schema).
    *
    * Equal-`ts_ms` ties: a `seq` column (source log sequence / Kafka
    * offset) outranks everything but ts_ms. To make that ordering hold
    * ACROSS micro-batches — two equal-ts_ms events for one key arriving
    * in different batches — `seq` must be part of the snapshot schema, so
    * the stored version remembers its sequence number; it then
    * participates in the merge ordering like any payload column. With a
    * changelog-only `seq` (not persisted in the snapshot), seq ordering
    * is batch-local and cross-batch equal-ts_ms ties fall back to
    * op-rank → payload-hash — deterministic, but able to diverge from a
    * one-shot replay of the same events. Persist `seq` whenever the
    * source can emit distinct events at one ts_ms across batches.
    */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
                     keyCol: String): DataFrame = {
    // fail the ⊇-columns contract loudly and by name — without this, a
    // changelog batch missing a persisted snapshot column (e.g. `seq`)
    // surfaces as an opaque unresolved-column AnalysisException mid-stream
    val missing = snapshot.columns.toSet -- changelog.columns.toSet
    require(missing.isEmpty,
      s"changelog must carry every snapshot column; missing: " +
        missing.toSeq.sorted.mkString(", "))
    // Deterministic priority: ts_ms → seq (if present) → op rank (delete
    // outranks update at the same instant) → payload hash, so ties can
    // never depend on partition iteration order.
    def opRank(df: DataFrame) = when(col("op") === "d", 3)
      .when(col("op") === "u", 2).when(col("op") === "r", 1).otherwise(0)
    val batchSeq = if (changelog.columns.contains("seq")) col("seq") else lit(0L)
    val wBatch = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_ms").desc, batchSeq.desc, opRank(changelog).desc,
        hash(changelog.columns.map(col).toSeq: _*).desc)
    val latestOfBatch = changelog
      .withColumn("__rn", row_number().over(wBatch))
      .filter(col("__rn") === 1).drop("__rn")
      .select(snapshot.columns.toSeq.map(col): _*)
    // merge with the snapshot's stored versions: the newer of (stored,
    // incoming) wins — a late replay can never roll a key backwards.
    // seq joins the cross-batch ordering iff the snapshot persists it
    // (see docstring); nulls_last so a legacy stored row without a seq
    // loses to a sequenced event at the same ts_ms.
    val merged = snapshot.unionByName(latestOfBatch)
    val storedSeq =
      if (snapshot.columns.contains("seq")) col("seq").desc_nulls_last
      else lit(0L).desc
    val wAll = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_ms").desc, storedSeq, opRank(merged).desc,
        hash(snapshot.columns.map(col).toSeq: _*).desc)
    merged.withColumn("__rn", row_number().over(wAll))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Live rows of a snapshot produced by [[applyChangelog]] (tombstones
    * filtered out). */
  def liveView(snapshot: DataFrame): DataFrame =
    snapshot.filter(col("op") =!= "d")

  /** Compact delete tombstones older than the replay horizon out of a
    * snapshot produced by [[applyChangelog]]. A tombstone exists to stop
    * a LATE event older than the delete from resurrecting its key; once
    * the source can no longer replay events that old (`nowMs -
    * horizonMs`), the tombstone is dead weight. One narrow filter — run
    * it opportunistically, e.g. while a bucket is being rewritten anyway
    * ([[graft.sources.IO.bucketedUpsertSink]]'s `compactHorizonMs`).
    * `nowMs` is explicit so compaction is deterministic and testable. */
  def compactTombstones(snapshot: DataFrame, horizonMs: Long,
                        nowMs: Long): DataFrame =
    snapshot.filter(col("op") =!= "d" || col("ts_ms") >= lit(nowMs - horizonMs))

  /** Convenience: replay a full changelog from an empty snapshot with the
    * given schema — used by the convergence tests (any permutation of the
    * same changelog must converge to the same snapshot). */
  def replay(spark: SparkSession, changelog: DataFrame, keyCol: String,
             snapshotSchema: StructType): DataFrame = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), snapshotSchema)
    applyChangelog(empty, changelog, keyCol)
  }
}
