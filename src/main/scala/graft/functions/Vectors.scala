package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector function pack over `ArrayType(FloatType)` embedding columns
  * (FIXTURES.md: `embeddings.embedding`, dim=64).
  *
  * dot / norm / cosine bottom out in [[VecDot]], a native Catalyst
  * expression with `doGenCode` — the whole scan → similarity → top-k
  * pipeline stays inside whole-stage codegen (higher-order functions
  * evaluate interpreted per element; UDFs break codegen entirely).
  * Accumulation is in double for stable ranking.
  */
object Vectors {

  /** Σ aᵢ·bᵢ, double accumulation, left-to-right (codegen'd). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. A zero-norm vector (e.g. the all-zero
    * feature vector Multimodal emits for undecodable content) yields null
    * rather than an ANSI DIVIDE_BY_ZERO job failure — and null ranks last
    * under `desc` ordering, which is the wanted semantics for top-k. */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Cosine against a constant query vector (broadcast as a literal into
    * the plan — the Spark replacement for the reference's per-record remote
    * lookup pattern). */
  def cosineTo(a: Column, q: Array[Float]): Column =
    cosine(a, typedLit(q.toSeq))

  /** Deterministic random hyperplanes for sign-LSH (seeded; same planes on
    * every invocation). Returns `planes(i)(j)`: i-th plane, j-th dim. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** ENGINE-PORTABLE integer hyperplanes for sign-LSH (round 15, the
    * q_similarity_lsh oracle conversion): component (i, j) is
    * `md5_lower64("<salt>:<i>:<j>") mod_unsigned 2049 − 1024` — an
    * integer in [−1024, 1024] a DuckDB oracle reproduces bit-for-bit as
    * `CAST(md5_number_lower(concat(salt, ':', i, ':', j)) % 2049 AS
    * BIGINT) - 1024` (the [[graft.functions.Text.md5Pair64]] family).
    * Returned as doubles so [[VecLshSignature]]'s accumulator ingests
    * them directly: against a 2^20-quantized vector every product is an
    * integer ≤ 2^30 and a 64-dim sum stays ≤ 2^36 ≪ 2^53, so the
    * double arithmetic is EXACT (order-independent) and the sign test
    * is cross-engine deterministic — no float tolerance anywhere. A
    * symmetric uniform family is a textbook sign-LSH (only the
    * direction distribution changes vs gaussian; recall floor
    * re-measured in ExemptBoundsSpec). */
  def intHyperplanes(numPlanes: Int, dim: Int,
                     salt: String = "graftlsh"): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (i, j) =>
      (java.lang.Long.remainderUnsigned(
        Text.md5Lower64(s"$salt:$i:$j"), 2049L) - 1024L).toDouble
    }

  /** Sign-LSH signature: bit i = [dot(v, plane_i) >= 0]. One fused
    * codegen'd pass over the vector ([[VecLshSignature]], single band). */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    element_at(ColumnBridge.column(
      VecLshSignature(ColumnBridge.expression(v), planes, planes.length)), 1)
  }

  /** Banded sign-LSH signatures: `bands` signatures of `planesPerBand` bits
    * each, computed in one fused codegen'd pass. Two vectors are ANN
    * candidates if any band matches. */
  def bandedSignatures(v: Column, bands: Int, planesPerBand: Int, dim: Int,
                       seed: Long = 42L): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val all = hyperplanes(bands * planesPerBand, dim, seed)
    ColumnBridge.column(
      VecLshSignature(ColumnBridge.expression(v), all, planesPerBand))
  }
}
