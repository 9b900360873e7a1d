package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-located join on bucketed tables plans zero shuffles") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(li.select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "k"), "b_li", 8, Seq("k"))
      Bucketing.writeBucketed(o.select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "k"), "b_o", 8, Seq("k"))

      val joined = Bucketing.coLocatedJoin(spark, "b_li", "b_o", Seq("k"))
      assert(Bucketing.exchangeCount(joined) == 0,
        "bucketed join must not shuffle")
      assert(joined.count() > 0)

      // same join on raw (unbucketed) frames shuffles both sides
      val raw = li.withColumnRenamed("l_orderkey", "k")
        .join(o.withColumnRenamed("o_orderkey", "k"), "k")
      assert(Bucketing.exchangeCount(raw) >= 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_li")
      spark.sql("DROP TABLE IF EXISTS b_o")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
