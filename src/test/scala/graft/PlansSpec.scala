package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Tests for the injected optimizer rules ([[graft.plans.RangeJoinRewrite]]
  * via [[GraftExtensions]]): plan-shape asserts + exact result parity with
  * the nested-loop plan the rule replaces.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def bands = spark.range(25)
    .selectExpr("id AS band_id", "id * 20.0 AS lo", "id * 20.0 + 25.0 AS hi")

  private def points = graft.sources.Tables.events(spark, sfDir)
    .select(col("event_id"), col("value"))

  private def rangeJoin = points.join(bands,
    col("value") >= col("lo") && col("value") < col("hi"))

  test("RangeJoinRewrite: fires on large-large range joins, result matches the nested loop exactly") {
    // reference result first: rule disabled (conf unset), default planning
    val want = rangeJoin.select("event_id", "band_id")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // nothing broadcastable
    spark.conf.set("spark.graft.rangeJoin.binWidth", "20.0")
    try {
      val joined = rangeJoin
      val plan = joined.queryExecution.sparkPlan
      // without the rewrite, a non-equi inner join with no broadcastable
      // side can only be a nested loop — its absence proves the rule fired
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"rewrite did not fire:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
      val got = joined.select("event_id", "band_id")
        .as[(Long, Long)].collect().toSet
      assert(got == want, "bin-grid rewrite changed the join result")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("RangeJoinRewrite: mixed-type bounds (INT lo, DOUBLE hi) still plan and match") {
    // the rule runs in the OPTIMIZER, after analyzer type coercion — a
    // comparison it constructs between differently-typed bounds must be
    // cast explicitly or the plan fails to resolve at planning time
    val mixedBands = spark.range(25)
      .selectExpr("id AS band_id", "CAST(id * 20 AS INT) AS lo",
        "id * 20.0 + 25.0 AS hi")
    val joined = points.join(mixedBands,
      col("value") >= col("lo") && col("value") < col("hi"))
    val want = joined.select("event_id", "band_id")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.binWidth", "20.0")
    try {
      val rewritten = points.join(mixedBands,
        col("value") >= col("lo") && col("value") < col("hi"))
      val plan = rewritten.queryExecution.sparkPlan // must not throw
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"rewrite did not fire on mixed-type bounds:\n$plan")
      val got = rewritten.select("event_id", "band_id")
        .as[(Long, Long)].collect().toSet
      assert(got == want, "mixed-type rewrite changed the join result")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("RangeJoinRewrite: stands down when a side is broadcast-able or the conf is unset") {
    // conf unset → untouched (BNLJ with the dim side broadcast is the
    // right plan and stays)
    val p1 = rangeJoin.queryExecution.sparkPlan
    assert(p1.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty)
    // conf set but the bands side is broadcast-sized under the default
    // threshold → the rule must leave the join alone
    spark.conf.set("spark.graft.rangeJoin.binWidth", "20.0")
    try {
      val p2 = rangeJoin.queryExecution.sparkPlan
      assert(p2.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty,
        s"rule must not rewrite broadcast-able range joins:\n$p2")
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("AQE skew join: a skewed shuffle partition is split at runtime") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // 95% of the left side lands on ONE join key: the classic hot-key
    // join. With the thresholds scaled to test-sized data, AQE must
    // recognize the oversized partition and split it instead of letting
    // one task drag the stage (the runtime complement to the manual
    // salting in operators/Skew).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .selectExpr("IF(id % 20 = 0, id, 0L) AS k", "id AS v")
      val right = spark.range(2000).selectExpr("id AS k", "id AS w")
      val joined = left.join(right, "k")
      val n = joined.count()
      assert(n > 0)
      val adaptive = joined.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.nonEmpty, "expected an adaptive plan")
      // count() re-plans; execute the join df itself to inspect its final plan
      val df2 = left.join(right, "k")
      df2.collect()
      val finalPlan = df2.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages hold their materialized plan out-of-band (not in
      // `children`), so a plain collect never sees inside them
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def findSmj(p: SparkPlan): Seq[SortMergeJoinExec] = {
        val here = p match { case s: SortMergeJoinExec => Seq(s); case _ => Nil }
        val kids = p match {
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here ++ kids.flatMap(findSmj)
      }
      val smjs = findSmj(finalPlan)
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-handled:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("RangeJoinRewrite: fires with the interval side on the LEFT too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.binWidth", "20.0")
    try {
      val joined = bands.join(points,
        col("value") >= col("lo") && col("value") < col("hi"))
      val plan = joined.queryExecution.sparkPlan
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"rewrite did not fire on the swapped arrangement:\n$plan")
      val got = joined.select("event_id", "band_id").as[(Long, Long)].collect().toSet
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      val want = bands.join(points,
        col("value") >= col("lo") && col("value") < col("hi"))
        .select("event_id", "band_id").as[(Long, Long)].collect().toSet
      assert(got == want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("join strategy hints are honored: broadcast / merge / shuffle_hash") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // the per-join strategy controls a tuner reaches for when Catalyst's
    // size estimates are off (stale stats, post-filter explosions)
    val li = graft.sources.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = graft.sources.Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    def join(hint: String) = li.join(ord.hint(hint),
      col("l_orderkey") === col("o_orderkey"))
    assert(join("broadcast").queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b }.nonEmpty, "broadcast hint ignored")
    assert(join("merge").queryExecution.sparkPlan.collect {
      case s: SortMergeJoinExec => s }.nonEmpty, "merge hint ignored")
    assert(join("shuffle_hash").queryExecution.sparkPlan.collect {
      case s: ShuffledHashJoinExec => s }.nonEmpty, "shuffle_hash hint ignored")
  }

  test("RangeJoinRewrite: extra join conjuncts survive the rewrite") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.rangeJoin.binWidth", "20.0")
    try {
      val joined = points.join(bands,
        col("value") >= col("lo") && col("value") < col("hi") &&
          col("event_id") % 2 === col("band_id") % 2)
      val plan = joined.queryExecution.sparkPlan
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
      val got = joined.select("event_id", "band_id").as[(Long, Long)].collect().toSet
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      val want = points.join(bands,
        col("value") >= col("lo") && col("value") < col("hi") &&
          col("event_id") % 2 === col("band_id") % 2)
        .select("event_id", "band_id").as[(Long, Long)].collect().toSet
      assert(got == want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }
}
