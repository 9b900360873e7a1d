package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (a handful of storms/documents dominating a 100 TB shuffle).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one side must be replicated anyway
  * (e.g. a dimension joined on a pathological key). `saltedJoin`
  * replicates the small side `salt` times and sprays the big side's rows
  * uniformly across the replicas, so one hot key fans out over `salt`
  * reducers instead of one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, spreading each big-side key over
    * `salt` partitions. `small` must be the replicable side. The spray is
    * derived from the full row content, so a retried/replanned task
    * re-sprays every row identically (no physical row ids anywhere). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame =
    saltedJoinBy(big, small, keys, big.columns.toSeq.map(col), salt, joinType)

  /** Deterministic variant: the spray key is derived from stable row
    * content (`sprayCols`) instead of a physical row id — same results
    * row-for-row across retries/replans. */
  def saltedJoinBy(big: DataFrame, small: DataFrame, keys: Seq[String],
      sprayCols: Seq[Column], salt: Int,
      joinType: String = "inner"): DataFrame = {
    val sprayed = big.withColumn("__salt", pmod(hash(sprayCols: _*), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    sprayed.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
