package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed co-located join (the 100 TB lever for repeated large-large
  * joins): persisting both sides bucketed by the join key removes the
  * per-query shuffle entirely — the physical plan contains no
  * ShuffleExchange before the join. This is the Spark replacement for the
  * reference's keyed Kafka-topic partitioning between layers. */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice")
    val o = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan
      val resolved = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = resolved.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found ${shuffles.length}:\n$resolved")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
