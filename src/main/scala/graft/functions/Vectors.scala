package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector function pack over `ArrayType(FloatType)` embedding columns
  * (FIXTURES.md: `embeddings.embedding`, dim=64).
  *
  * All of dot / norm / cosine are composed from codegen'd SQL higher-order
  * functions (`zip_with` + `aggregate`) — no UDF, stays inside whole-stage
  * codegen. Accumulation is in double for stable ranking.
  */
object Vectors {

  /** Σ aᵢ·bᵢ, double accumulation, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe only insofar as parquet arrays
    * here are non-null. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Sign-LSH signature: bit i = [dot(v, plane_i) >= 0]. Composed from SQL
    * primitives so it runs inside codegen and pushes no UDF into the scan. */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded sign-LSH signatures: `bands` signatures of `planesPerBand` bits
    * each. Two vectors are ANN candidates if any band matches. */
  def bandedSignatures(v: Column, bands: Int, planesPerBand: Int, dim: Int,
                       seed: Long = 42L): Column = {
    val all = hyperplanes(bands * planesPerBand, dim, seed)
    array((0 until bands).map { b =>
      val bandPlanes = all.slice(b * planesPerBand, (b + 1) * planesPerBand)
      lshSignature(v, bandPlanes)
    }: _*)
  }
}
