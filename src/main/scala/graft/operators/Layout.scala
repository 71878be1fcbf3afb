package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering for scan
  * locality (SURVEY.md §2.K extensions — the data-layout lever for
  * 100 TB tables).
  *
  * A table range-partitioned on ONE column prunes well on that column
  * and not at all on others. Z-ordering interleaves the bits of two
  * sort dimensions into one clustering key, so files end up covering
  * small RECTANGLES of the (x, y) space instead of thin stripes —
  * min/max file statistics then prune scans filtered on EITHER
  * dimension (the technique behind Delta/Iceberg Z-ORDER clustering,
  * public knowledge from the Morton-order literature).
  */
object Layout {

  /** Morton (Z-order) value of two non-negative dimensions: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Built as an unrolled
    * chain of shift/mask/or Column primitives — pure codegen, no UDF;
    * 2×`bits` terms (default 16 → 32 ops). Inputs are masked to `bits`
    * low bits, so callers quantize/clamp dimensions first (negative or
    * overflowing values would otherwise interleave garbage). */
  def zorderValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` clustered in Z-order on (`colA`, `colB`): range-partition
    * on the Morton value (Spark samples the key distribution for balanced
    * file boundaries), sort within each file, write one file per
    * partition. The `__z` clustering key is kept in the output — it is
    * the file-level sort key and costs 8 bytes; readers ignore it.
    * Scale shape: one range-exchange (same cost class as any global
    * sort-write) buys every later scan two-dimensional min/max pruning. */
  def writeZordered(df: DataFrame, colA: String, colB: String,
                    outDir: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorderValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .write.mode("overwrite").parquet(outDir)
}
