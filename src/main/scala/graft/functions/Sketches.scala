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

  /** Engine-portable count-min sketch geometry: depth×width counter
    * grid. Width 8192 gives a one-sided error bound of eps = e/8192 ≈
    * 3.3e-4 of the stream length per counter row; depth 4 puts the
    * miss probability at e^-4 ≈ 1.8%. The whole sketch is
    * `CmsDepth · CmsWidth` = 32768 (row, cell) counter cells — a
    * broadcast-sized RELATION at any stream length, which is the point:
    * built as one map-side-combinable groupBy instead of a driver-merged
    * opaque sketch object, so the counting pass scales exactly like any
    * keyed count and the counters join back broadcast. */
  val CmsDepth = 4
  val CmsWidth = 8192L

  /** The [[CmsDepth]] cell indices of a key — the Kirsch–Mitzenmacher
    * double-hash family `(a + i·b) mod 2^63 mod width` over the key's
    * md5 halves ([[graft.functions.Text.md5Pair64]]): the same algebra
    * as the MinHash family ([[graft.operators.Dedup.hashSeeded]]), so a
    * DuckDB oracle replays every cell bit-for-bit via
    * `(md5_number_upper ± i·md5_number_lower) % 9223372036854775808 %
    * width` — what moved q_heavy_hitters_approx onto the hard oracle
    * (round 15). Wrapped Long arithmetic masked to 63 bits IS the exact
    * mod (2^63 divides 2^64), and 8192 divides 2^63, so the double mod
    * collapses identically on both engines. */
  val cmsCells: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (key: String) =>
      val (a, b) = Text.md5Pair64("cms:" + key)
      Array.tabulate(CmsDepth)(i => ((a + i * b) & Long.MaxValue) % CmsWidth)
    }
}
