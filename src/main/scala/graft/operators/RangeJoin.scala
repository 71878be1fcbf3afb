package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-large range joins, Spark-first (SURVEY.md §2.C extensions).
  *
  * Catalyst plans a non-equi containment join (`p.v BETWEEN i.lo AND
  * i.hi`) as a BroadcastNestedLoopJoin — fine while one side fits in a
  * broadcast, a scale-killer once both sides are large (O(|P|·|I|)
  * comparisons and an unbounded broadcast). The standard scale path is
  * QUANTIZATION: overlay a fixed bin grid on the join dimension, explode
  * each interval into the bins it overlaps, tag each point with its
  * containing bin, equi-join on the bin key (a plain hash shuffle —
  * partial-agg-friendly, AQE-skew-splittable, no broadcast needed), and
  * re-check the exact predicate to discard grid false positives. Cost is
  * O(|I|·span/binWidth + |P|) shuffled rows instead of a nested loop —
  * tunable via `binWidth`.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them
    * (`lo ≤ v < hi`, half-open) via the bin-grid equi join. `binWidth`
    * trades interval replication (≈span/binWidth rows per interval)
    * against per-bin candidate fan-in; set it near the median interval
    * span. Negative domains work (`floor` semantics); intervals with
    * `lo > hi` are empty and dropped (Spark's `sequence` would otherwise
    * count DOWN and fabricate bins). Both inputs keep all their columns;
    * the bin key is internal. */
  def binnedIntervalJoin(points: DataFrame, pointCol: String,
                         intervals: DataFrame, loCol: String, hiCol: String,
                         binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binOf(v: Column): Column = floor(v / lit(binWidth)).cast("long")
    val expanded = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    points
      .withColumn("__bin", binOf(col(pointCol)))
      .join(expanded, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

}
