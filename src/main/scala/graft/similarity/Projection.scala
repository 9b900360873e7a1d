package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Johnson–Lindenstrauss random projection: reduce an embedding column
  * to `outDim` dimensions with a seeded Gaussian matrix, preserving
  * pairwise geometry to ~1/sqrt(outDim) distortion — the standard
  * preprocessing step before ANN indexing / clustering when the source
  * dimension is large (project once, index the narrow vectors; distances
  * in the projected space rank candidates, the source space re-ranks).
  *
  * Scale shape: one narrow map-side pass — each output component is a
  * literal-coefficient dot product, fully inside whole-stage codegen; no
  * shuffle, no UDF, no matrix broadcast (the matrix is part of the
  * PLAN). Determinism: the matrix derives from the shared seeded
  * Gaussian draw ([[Dedup.hyperplaneTables]]), sums run left-to-right,
  * so an external engine replays the values bit-for-bit by
  * interpolating the same literal coefficients in the same fold order.
  */
object Projection {

  /** The `outDim` × `dim` projection matrix for a seed — exposed so
    * oracles/serving can re-embed the exact constants. */
  def matrix(outDim: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    Dedup.hyperplaneTables(1, outDim, dim, seed).head

  /** (idCol, vecCol) → (id, p): p(j) = (row_j · v) / sqrt(outDim),
    * components summed left-to-right per row — one native
    * [[graft.functions.expressions.MatVec]] loop per row (the
    * outDim×dim literal-expression form breaks janino's method limits
    * and falls out of codegen; the native expression stays inside). */
  def project(emb: DataFrame, vecCol: String, idCol: String,
      outDim: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val m = matrix(outDim, dim, seed).map(_.toArray).toArray
    val scale = math.sqrt(outDim.toDouble)
    emb.select(col(idCol).as("id"),
      graft.functions.expressions.MatVec.matVecNative(
        col(vecCol), m, scale).as("p"))
  }
}
