package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: verify every testdata table is readable and print schemas. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.sources.Tables.names) {
      try {
        // Tables.load special-cases events' TIMESTAMP(NANOS) column
        val df = graft.sources.Tables.load(spark, sfDir, t)
        println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
