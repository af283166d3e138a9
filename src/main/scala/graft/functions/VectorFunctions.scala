package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators (`Array[Float]` columns) for similarity search
  * over the `embeddings` table. Pure Column expressions via the higher-order
  * array functions — no UDFs, so they stay inside codegen.
  */
object VectorFunctions {

  /** Cast a float array to double for stable arithmetic. */
  private def d(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays (double result,
    * left-to-right summation — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `n` planes of
    * dimension `dim`, seeded; returned as literal nested arrays so the
    * bucketing is a pure expression broadcast with the plan. */
  def hyperplanes(n: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n, dim)(rng.nextGaussian())
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot product).
    * Vectors in the same bucket are ANN candidates; probe neighboring
    * buckets for recall. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val vd = d(v)
    planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      val s = aggregate(zip_with(vd, pl, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }
}
