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
}
