package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Golden tests for the bin-grid range join: agreement with the naive
  * theta join, half-open boundary semantics, degenerate intervals, and
  * the plan property that justifies the operator (equi join, no nested
  * loop). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, -15.0), (2L, -10.0), (3L, 0.0), (4L, 7.5), (5L, 10.0),
    (6L, 19.999), (7L, 20.0), (8L, 42.0), (9L, 100.0))
    .toDF("pid", "v")

  private val intervals = Seq(
    (100L, -20.0, 0.0),   // negative domain, hi exclusive at 0.0
    (101L, 0.0, 20.0),    // [0, 20): catches 0.0, 7.5, 10.0, 19.999
    (102L, 10.0, 30.0),   // overlaps 101 — multi-match for 10.0, 19.999
    (103L, 50.0, 40.0),   // empty (lo > hi) — must vanish, not count down
    (104L, 42.0, 42.0)    // zero-width [42, 42) — empty under half-open
  ).toDF("iid", "lo", "hi")

  private def joined = RangeJoin.binnedIntervalJoin(
    points, "v", intervals, "lo", "hi", binWidth = 8.0)

  test("binnedIntervalJoin agrees with the naive theta join") {
    val got = joined.select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
    // pin the semantics by hand too: lo inclusive (3 in 101, 7 in 102),
    // hi exclusive (3 NOT in 100, 7 NOT in 101), multi-match (5, 6 in
    // both 101 and 102), negative domain (1, 2 in 100), empty intervals
    // match nothing (103, 104), unmatched point drops (9)
    assert(want == Set(
      (1L, 100L), (2L, 100L), (3L, 101L), (4L, 101L),
      (5L, 101L), (5L, 102L), (6L, 101L), (6L, 102L), (7L, 102L)))
  }

  test("binnedIntervalJoin plans an equi join — no nested loop, no cartesian") {
    val plan = joined.queryExecution.sparkPlan
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "bin-grid rewrite must not fall back to a nested-loop join")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_join_range matches a brute-force band aggregate at sf0.001") {
    val got = Queries.q_join_range(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val bands = spark.range(25).select(col("id").as("band_id"),
      (col("id") * 20.0).as("lo"), (col("id") * 20.0 + 25.0).as("hi"))
    val want = graft.sources.Tables.events(spark, sfDir)
      .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("band_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
  }
}
