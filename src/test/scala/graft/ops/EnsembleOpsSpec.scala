package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EnsembleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("claim gate is non-vacuous: claims, pre-assigned, and unclaimed coexist") {
    val out = EnsembleOps.claimTracks(spark, dir).cache()
    assert(out.filter(col("annual_id") > 0 && col("storm_name").startsWith("INV")).count() > 0)
    assert(out.filter(col("storm_name").startsWith("PRE_")).count() > 0)
    assert(out.filter(col("annual_id") === 0).count() > 0)
    out.unpersist()
  }

  test("pre-assigned tracks keep their annual_id and name") {
    val pre = EnsembleOps.trackPoints(spark, dir).filter(col("annual_id") > 0)
      .select("model", "init", "ens", "track_no", "hour", "annual_id", "storm_name")
    val out = EnsembleOps.claimTracks(spark, dir)
      .select("model", "init", "ens", "track_no", "hour", "annual_id", "storm_name")
    assert(pre.exceptAll(out.filter(col("storm_name").startsWith("PRE_"))).count() == 0)
  }

  test("each claimed track carries exactly one invest") {
    val claimed = EnsembleOps.claimTracks(spark, dir)
      .filter(col("storm_name").startsWith("INV"))
      .groupBy("model", "init", "ens", "track_no")
      .agg(countDistinct("annual_id").as("n"))
    assert(claimed.filter(col("n") =!= 1).count() == 0)
  }
}
