package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling / dataset-split operators for training-data pipelines
  * (SURVEY.md §2.K extensions; driver brief "operations a large-scale
  * training-data pipeline would need").
  */
object Sampling {

  /** Deterministic train/val/test assignment keyed on the row id: the
    * first two hex chars of `md5(id)` give 256 uniform cells; cell-range
    * membership decides the split. Properties a training pipeline needs
    * that RNG sampling lacks:
    *
    *   - stable: a document keeps its split across runs, engines, and
    *     languages (md5 is everywhere — the DuckDB oracle reproduces the
    *     assignment bit-for-bit);
    *   - incremental: newly arrived rows get consistent assignments with
    *     no carried RNG state;
    *   - leak-free: membership depends only on the key, so derived
    *     tables split identically.
    *
    * A narrow map — no shuffle, no sampling pass. `trainCells`/`valCells`
    * are out of 256 (defaults 204/26 ≈ 80/10/10). */
  def deterministicSplit(df: DataFrame, idCol: String,
                         trainCells: Int = 204,
                         valCells: Int = 26): DataFrame = {
    require(trainCells > 0 && valCells >= 0 && trainCells + valCells <= 256,
      "cells must partition the 256 md5-prefix space")
    // 256 has no 2-hex form ("100" breaks the 2-char compare): any char
    // above 'f' is lexicographically past every cell, so "g" = "all cells"
    def boundary(cells: Int): String = if (cells >= 256) "g" else f"$cells%02x"
    val cell = substring(md5(col(idCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(cell < lit(boundary(trainCells)), "train")
        .when(cell < lit(boundary(trainCells + valCells)), "val")
        .otherwise("test"))
  }

  /** Deterministic shard writer for training output: every row gets a
    * stable `shard = pmod(xxhash64(id), numShards)`, the frame is
    * repartitioned on that shard key (so each shard is produced by one
    * task — one file per shard, no tiny-file spray), and rows within a
    * shard are laid out in salted-hash order: a reproducible "shuffle"
    * for data loaders with no RNG state. Re-running over the same input
    * yields identical shard membership and order; appending new rows
    * never moves existing ones between shards. */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
                  numShards: Int): Unit =
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(numShards.toLong)))
      .repartition(numShards, col("shard"))
      // shard must lead the ordering: it satisfies the dynamic-partition
      // writer's required ordering, so V1Writes does NOT stack its own
      // Sort(shard) on top — one sort, and the salted order is contractual
      .sortWithinPartitions(col("shard"), xxhash64(col(idCol), lit(1L)))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Per-stratum downsampling (class rebalancing): keep the given
    * fraction of each stratum, seeded Bernoulli per row — Spark's
    * `stat.sampleBy`, one narrow pass, no shuffle. Strata absent from
    * `fractions` are dropped (fraction 0), the rebalance contract. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
