package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns as pure column
  * expressions. Floats are widened to double BEFORE any arithmetic so the
  * result is the IEEE-exact double computation on both Spark and the
  * oracle engine (f32 multiply would diverge).
  */
object Vectors {

  private def widen(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(widen(a), widen(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(widen(a), widen(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature bit: sign of dot(v, plane) — building
    * block for LSH bucketing (plane given as literal array). */
  def hyperplaneBit(v: Column, plane: Seq[Double]): Column = {
    val p = array(plane.map(lit): _*)
    (dot(v, p) >= 0).cast("int")
  }
}
