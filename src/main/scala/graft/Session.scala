package graft

import org.apache.spark.sql.SparkSession

/** Shared session configuration for entry points and tests.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting), shuffle
  * partitions sized to the local core count (the driver harness overrides
  * via SPARK_GRAFT_CPUS; a real cluster would size to executors), UTC
  * session time zone for oracle parity, nanos-parquet read enabled.
  */
object Session {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.withExtensions(graft.plans.TopK.extensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    // builder-time injection lands the rewrite in the operator-
    // optimization batch; the runtime registration additionally runs it
    // in the END-of-optimization user batch, where it removes the
    // WindowGroupLimit Spark infers on top of an injected TopKPerGroup
    graft.plans.TopK.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
