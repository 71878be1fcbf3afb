package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only partitioned-maintenance scale probe: MEASURES what the
  * round-11 maintenance verbs claim. Builds a date-partitioned ingest
  * table the way a streaming appender fragments one (`nBatches`
  * micro-batches, each laying one file into every one of `nDays` day
  * partitions), then measures
  *
  *   1. the fragmented full-scan cost vs the same scan after
  *      `compactPartitionedDir` (files: days×batches → days),
  *   2. compaction idempotence at scale (second run compacts 0),
  *   3. fragmentation-PROPORTIONAL repair: re-fragment only `hotDays`
  *      partitions and confirm the next compact touches exactly those,
  *   4. `expirePartitions` of the oldest quarter — metadata-only
  *      whole-directory deletes, wall time independent of data volume.
  *
  * Prints ONE JSON line. Usage:
  * runMain graft.tools.MaintenanceScale [nDays] [nBatches] [rowsPerDayBatch]
  */
object MaintenanceScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nDays = if (args.nonEmpty) args(0).toInt else 32
    val nBatches = if (args.length > 1) args(1).toInt else 64
    val rows = if (args.length > 2) args(2).toInt else 3000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("maint_").toString + "/t"
    def day(i: Int): String = f"2026-${1 + i / 28}%02d-${1 + i % 28}%02d"
    def batch(rowsPer: Int): org.apache.spark.sql.DataFrame = {
      val days = (0 until nDays).map(day)
      val dayCol = element_at(
        array(days.map(lit): _*), (pmod(col("id"), lit(nDays)) + 1).cast("int"))
      spark.range(nDays.toLong * rowsPer)
        .select(dayCol.as("day"), col("id").as("v"))
    }
    // fragment: each append lands one file per day partition (the
    // aligned-write discipline — the fragmentation here is the HONEST
    // per-batch file, not the unaligned tasks×partitions storm)
    for (_ <- 1 to nBatches)
      graft.sources.IO.alignToPartitions(batch(rows), "day")
        .write.mode("append").partitionBy("day").parquet(dir)

    def countFiles(): Int =
      graft.sources.IO.partitionCensus(spark, dir, "day").map(_.files).sum
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def fullScan(): Long =
      spark.read.parquet(dir).agg(sum("v"), count(lit(1)))
        .collect().head.getLong(1)

    val filesBefore = countFiles()
    val (n0, readBefore) = timed(fullScan())
    val (compacted, compactS) = timed(
      graft.sources.IO.compactPartitionedDir(spark, dir, "day"))
    val filesAfter = countFiles()
    val (n1, readAfter) = timed(fullScan())
    require(n0 == n1, s"compaction changed the row count: $n0 != $n1")
    val (again, _) = timed(
      graft.sources.IO.compactPartitionedDir(spark, dir, "day"))

    // hot-partition re-fragmentation: 8 more appends into 4 days only
    val hotDays = (0 until 4).map(day)
    for (_ <- 1 to 8)
      graft.sources.IO.alignToPartitions(
          batch(rows).filter(col("day").isin(hotDays: _*)), "day")
        .write.mode("append").partitionBy("day").parquet(dir)
    val (hotCompacted, hotS) = timed(
      graft.sources.IO.compactPartitionedDir(spark, dir, "day"))
    require(hotCompacted.sorted == hotDays.map("day=" + _).sorted,
      s"compact must touch exactly the re-fragmented days: $hotCompacted")

    // TTL: expire the oldest quarter — metadata only
    val cutoff = day(nDays / 4)
    val (expired, expireS) = timed(
      graft.sources.IO.expirePartitions(spark, dir, "day", _ < cutoff))
    val rowsLeft = fullScan()

    println(
      s"""{"tool":"MaintenanceScale","days":$nDays,"batches":$nBatches,""" +
      s""""rows":$n0,"files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""read_before_s":${f"$readBefore%.2f"},"read_after_s":${f"$readAfter%.2f"},""" +
      s""""compact_s":${f"$compactS%.2f"},"second_compact_n":${again.size},""" +
      s""""hot_compact_n":${hotCompacted.size},"hot_compact_s":${f"$hotS%.2f"},""" +
      s""""expired_parts":${expired.size},"expire_s":${f"$expireS%.3f"},""" +
      s""""rows_after_expire":$rowsLeft}""")
    spark.stop()
  }
}
