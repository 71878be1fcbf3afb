package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable set sketches as grouped AGGREGATES (SURVEY.md §2.J UDAF
  * surface, §2.K extensions).
  *
  * The MinHash signature of a set is the per-hash MINIMUM over its
  * elements, and min commutes with union — so the elementwise min of
  * per-row signatures IS the signature of the union of the rows'
  * element sets. That merge law is what makes the sketch cluster-safe:
  * executor-local partials combine associatively (map-side partial
  * aggregation, one keyed shuffle of `numHashes` longs per group,
  * never the groups' token sets), and two group-level signatures
  * estimate the Jaccard similarity of entire corpora slices without a
  * pair join over their rows.
  */
object Sketches {

  /** Elementwise-min `Aggregator` over per-row MinHash signatures
    * (arrays of `numHashes` longs, e.g. the `sig` column of
    * [[graft.operators.Dedup.minhashSignatures]]). Null or empty input
    * signatures (shingle-less docs) contribute nothing; a group with no
    * signatures yields the identity (all `Long.MaxValue`). O(numHashes)
    * state per group per partition. */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(numHashes > 0)

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(b: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig != null && sig.length == numHashes) {
        var i = 0
        while (i < numHashes) { if (sig(i) < b(i)) b(i) = sig(i); i += 1 }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate column: MinHash signature of the UNION of the group's
    * element sets. */
  def minhashUnion(sig: Column, numHashes: Int = 32): Column =
    udaf(new MinHashUnion(numHashes)).apply(sig)

  /** Estimated Jaccard similarity between two signatures: the fraction
    * of agreeing components (standard MinHash estimator, sd ≈
    * √(J(1−J)/numHashes)). Higher-order functions over a fixed
    * `numHashes`-long array — interpreted, but O(numHashes) per GROUP
    * PAIR, never per row. */
  def sigSimilarity(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, m) => acc + m
    ).cast("double") / size(a).cast("double")
}
