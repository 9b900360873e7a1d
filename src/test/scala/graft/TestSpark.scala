package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Session.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .getOrCreate()
    graft.plans.TopK.ensureRegistered(s) // end-of-optimization cleanup batch
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
