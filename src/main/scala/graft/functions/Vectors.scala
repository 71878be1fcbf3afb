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
