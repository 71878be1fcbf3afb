package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Cdc

/** CDC changelog tests (SURVEY.md §2.I "CDC apply / upsert", §7.4):
  * envelope parsing with the dirty-data guard, last-writer-wins apply,
  * delete handling, and permutation convergence — replaying the same
  * changelog in any order must produce the same snapshot. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshotSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("op", StringType), StructField("ts_ms", LongType)))

  test("parseEnvelope: extracts op/table/ts_ms, drops malformed JSON") {
    val raw = Seq(
      """{"op":"c","before":null,"after":"{\"id\":1}","source":{"table":"dim_user"},"ts_ms":100}""",
      """{"op":"u","before":"{\"id\":1}","after":"{\"id\":1,\"x\":2}","source":{"table":"dim_sku"},"ts_ms":200}""",
      """not json at all""",
      """{"unrelated":true}""").toDF("value")
    val parsed = Cdc.parseEnvelope(raw)
    val rows = parsed.select("op", "table", "ts_ms").as[(String, String, Long)]
      .collect().sortBy(_._3)
    assert(rows.toSeq == Seq(("c", "dim_user", 100L), ("u", "dim_sku", 200L)))
  }

  test("routeByConfig keeps only whitelisted tables (broadcast config state)") {
    val changelog = Seq(("c", "dim_user", 1L), ("c", "other", 2L), ("u", "dim_sku", 3L))
      .toDF("op", "table", "ts_ms")
    val config = Seq("dim_user", "dim_sku").toDF("table")
    val kept = Cdc.routeByConfig(changelog, config).select("table")
      .as[String].collect().sorted.toSeq
    assert(kept == Seq("dim_sku", "dim_user"))
  }

  test("applyChangelog: upsert + delete, last writer wins by ts_ms") {
    val snapshot = Seq((1L, "old", "r", 0L), (2L, "keep", "r", 0L))
      .toDF("id", "name", "op", "ts_ms")
    val changelog = Seq(
      (1L, "v1", "u", 100L), (1L, "v2", "u", 200L), // later update wins
      (3L, "new", "c", 150L),
      (2L, null.asInstanceOf[String], "d", 300L))   // delete key 2
      .toDF("id", "name", "op", "ts_ms")
    val out = Cdc.liveView(Cdc.applyChangelog(snapshot, changelog, "id"))
      .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "v2"), (3L, "new")))
  }

  test("a late event older than the stored version cannot roll a key back") {
    // batch 1 installs version 200; batch 2 delivers a replayed older
    // event (ts 100) — the snapshot must keep version 200. Same for a
    // late upsert older than a delete tombstone: the key stays dead.
    val snap1 = Cdc.replay(spark,
      Seq((1L, "new", "u", 200L), (2L, null.asInstanceOf[String], "d", 300L))
        .toDF("id", "name", "op", "ts_ms"), "id", snapshotSchema)
    val snap2 = Cdc.applyChangelog(snap1,
      Seq((1L, "old", "u", 100L), (2L, "zombie", "u", 250L))
        .toDF("id", "name", "op", "ts_ms"), "id")
    val live = Cdc.liveView(snap2).select("id", "name")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(live == Seq((1L, "new")), s"stale events must lose: $live")
  }

  test("replay convergence: every permutation of the changelog yields the same snapshot") {
    val events = Seq(
      (1L, "a", "c", 10L), (1L, "b", "u", 20L), (1L, null.asInstanceOf[String], "d", 30L),
      (1L, "c", "c", 40L), (2L, "x", "c", 15L), (2L, "y", "u", 25L))
    val expected = Seq((1L, "c"), (2L, "y"))
    // sample permutations SPREAD across the full factorial space —
    // .take(24) alone would only vary the tail, never the first events
    events.permutations.grouped(30).map(_.head).take(24).foreach { perm =>
      val changelog = perm.toDF("id", "name", "op", "ts_ms")
      val out = Cdc.liveView(Cdc.replay(spark, changelog, "id", snapshotSchema))
        .select("id", "name").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(out == expected, s"order ${perm.map(_._4)} diverged: $out")
    }
  }

  test("equal-ts_ms ties break deterministically (delete outranks update)") {
    val changelog = Seq((1L, "u_payload", "u", 100L), (1L, null.asInstanceOf[String], "d", 100L))
    // any permutation, any partitioning: the delete must win every time
    for (perm <- changelog.permutations) {
      val out = Cdc.liveView(Cdc.replay(spark,
        perm.toDF("id", "name", "op", "ts_ms"), "id", snapshotSchema)).count()
      assert(out == 0L, s"delete must deterministically win the ts tie ($perm)")
    }
  }

  test("DIM job end-to-end: raw JSON changelog stream -> parse -> route -> upsert snapshot") {
    // the reference's full DIM lifecycle (SURVEY §3.1): Kafka topic_db →
    // JSON parse + dirty filter → broadcast-config table routing → keyed
    // dim store upsert. Hermetic: file stream in, parquet snapshot out.
    import java.nio.file.Files
    val in = Files.createTempDirectory("cdc_raw_").toString
    val snap = Files.createTempDirectory("dim_").toString + "/snap"
    val ck = Files.createTempDirectory("ck_").toString
    def payload(id: Long, name: String) = s"""{\\"id\\":$id,\\"name\\":\\"$name\\"}"""
    Seq(
      s"""{"op":"c","after":"${payload(1, "alice")}","source":{"table":"dim_user"},"ts_ms":100}""",
      s"""{"op":"c","after":"${payload(2, "bob")}","source":{"table":"ignored_table"},"ts_ms":110}""",
      "garbage line",
      s"""{"op":"u","after":"${payload(1, "alice2")}","source":{"table":"dim_user"},"ts_ms":200}""")
      .toDF("value").write.mode("append").text(in)
    val config = Seq("dim_user").toDF("table")
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType)))).text(in)
    val routed = Cdc.routeByConfig(Cdc.parseEnvelope(raw), config)
      .select(
        get_json_object(col("after"), "$.id").try_cast("long").as("id"),
        get_json_object(col("after"), "$.name").as("name"),
        col("op"), col("ts_ms"))
    graft.sources.IO.upsertSink(routed, snap, ck, "id", snapshotSchema)
      .start().awaitTermination()
    val result = spark.read.schema(snapshotSchema).parquet(snap)
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(result == Seq((1L, "alice2")),
      s"only whitelisted dim_user key 1 at latest version: $result")
  }

  test("cross-batch equal-ts_ms tie: persisted seq keeps incremental == replay") {
    // two updates to one key at the SAME ts_ms with distinct source
    // sequence numbers, delivered in different micro-batches: the
    // higher-seq event must win in every delivery order, and incremental
    // apply must equal a one-shot replay. This only holds when the
    // snapshot schema persists `seq` — the stored version has to remember
    // its sequence number to defend (or lose) the tie in a later batch.
    val seqSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("op", StringType), StructField("ts_ms", LongType),
      StructField("seq", LongType)))
    val e1 = (1L, "first", "u", 100L, 1L)
    val e2 = (1L, "second", "u", 100L, 2L)
    val oneShot = Cdc.liveView(Cdc.replay(spark,
      Seq(e1, e2).toDF("id", "name", "op", "ts_ms", "seq"), "id", seqSchema))
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(oneShot == Seq((1L, "second")), s"replay must pick seq=2: $oneShot")
    // both batch orders: low-seq then high-seq, and high-seq then low-seq
    // (the second order is the regression case — without a persisted seq
    // the stored winner would have to defend the tie by payload hash)
    for (batches <- Seq(Seq(e1) -> Seq(e2), Seq(e2) -> Seq(e1))) {
      val snap1 = Cdc.replay(spark,
        batches._1.toDF("id", "name", "op", "ts_ms", "seq"), "id", seqSchema)
      val incr = Cdc.liveView(Cdc.applyChangelog(snap1,
        batches._2.toDF("id", "name", "op", "ts_ms", "seq"), "id"))
        .select("id", "name").as[(Long, String)].collect().toSeq
      assert(incr == oneShot,
        s"batch split ${batches._1.map(_._5)}|${batches._2.map(_._5)} diverged: $incr")
    }
  }

  test("compactTombstones drops only tombstones older than the replay horizon") {
    val snap = Cdc.replay(spark, Seq(
      (1L, "live", "u", 500L),
      (2L, null.asInstanceOf[String], "d", 100L),  // old tombstone → compacted
      (3L, null.asInstanceOf[String], "d", 900L),  // recent tombstone → kept
      (4L, "old_live", "u", 50L))                  // old but LIVE → kept
      .toDF("id", "name", "op", "ts_ms"), "id", snapshotSchema)
    val compacted = Cdc.compactTombstones(snap, horizonMs = 300L, nowMs = 1000L)
    val ids = compacted.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L),
      s"only key 2's horizon-expired tombstone may go: $ids")
    // semantics preserved for everything the source can still replay:
    // a late event NEWER than the horizon still loses to key 3's stone
    val after = Cdc.liveView(Cdc.applyChangelog(compacted,
      Seq((3L, "zombie", "u", 800L)).toDF("id", "name", "op", "ts_ms"), "id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(after == Seq(1L, 4L), s"key 3 must stay dead: $after")
  }

  test("applyChangelog is incremental: applying in two chunks equals one-shot") {
    val all = Seq((1L, "a", "c", 10L), (2L, "b", "c", 20L), (1L, "a2", "u", 30L),
      (2L, null.asInstanceOf[String], "d", 40L), (3L, "c", "c", 50L))
    val (chunk1, chunk2) = all.splitAt(2)
    val oneShot = Cdc.liveView(Cdc.replay(spark,
      all.toDF("id", "name", "op", "ts_ms"), "id", snapshotSchema))
      .select("id", "name").as[(Long, String)].collect().sorted.toSeq
    val snap1 = Cdc.replay(spark, chunk1.toDF("id", "name", "op", "ts_ms"), "id",
      snapshotSchema)
    val twoStep = Cdc.liveView(Cdc.applyChangelog(snap1,
      chunk2.toDF("id", "name", "op", "ts_ms"), "id"))
      .select("id", "name").as[(Long, String)].collect().sorted.toSeq
    assert(oneShot == twoStep)
    assert(oneShot == Seq((1L, "a2"), (3L, "c")))
  }
}
