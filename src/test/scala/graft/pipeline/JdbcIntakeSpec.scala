package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JDBC intake against an embedded Derby instance shaped like the
  * reference's MySQL star schema (regions dim + storms fact,
  * /root/reference/db/init_db_base.sql): the partitioned read, the
  * filter pushdown, and the Store-schema mapping. */
class JdbcIntakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val url: String = {
    val base = s"/tmp/graft_ss/p${ProcessHandle.current().pid}/derby_spec"
    FsUtils.deleteRecursively(new java.io.File(base))
    val u = s"jdbc:derby:$base/db;create=true"
    val props = new java.util.Properties
    Seq((1, "North Atlantic", "AL", "l"), (2, "East Pacific", "EP", "e"),
        (4, "West Pacific", "WP", "w"))
      .toDF("id", "long_name", "short_name", "region_char")
      .write.mode("overwrite").jdbc(u, "regions", props)
    Seq(
      (1, 1, 1, 9, "AL092005", 2005, Timestamp.valueOf("2005-08-23 18:00:00"),
        Timestamp.valueOf("2005-08-31 06:00:00"), "ARCHIVE", "Katrina",
        23.1f, -75.1f, "r1", Timestamp.valueOf("2006-01-01 00:00:00")),
      (2, 2, 2, 16, "EP162018", 2018, Timestamp.valueOf("2018-09-26 12:00:00"),
        null.asInstanceOf[Timestamp], "ACTIVE", "Rosa",
        13.4f, -105.8f, "r2", Timestamp.valueOf("2018-09-27 00:00:00")),
      (3, 3, 4, 28, "WP282019", 2019, Timestamp.valueOf("2019-11-05 00:00:00"),
        Timestamp.valueOf("2019-11-09 18:00:00"), "ARCHIVE", "Halong",
        14.2f, 153.1f, "r2", Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("id", "annual_id", "region_id", "nhc_number", "nhc_id", "season",
        "start_date", "end_date", "status", "name", "start_lat", "start_lon",
        "run_id", "last_update")
      .write.mode("overwrite").jdbc(u, "storms", props)
    u
  }

  test("stormsFromStar lands in the exact Store storms schema") {
    val df = JdbcIntake.stormsFromStar(spark, url, numPartitions = 2)
    val want = graft.schema.Schemas.storms
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      want.fields.map(f => (f.name, f.dataType)).toSeq,
      s"\ngot:  ${df.schema.treeString}\nwant: ${want.treeString}")
    val rows = df.orderBy("season").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("region")).toSeq == Seq("AL", "EP", "WP"))
    assert(rows(0).getAs[String]("name") == "Katrina")
    assert(rows(1).isNullAt(rows(1).fieldIndex("end_date"))) // ACTIVE storm
    assert(math.abs(rows(2).getAs[Double]("start_lon") - 153.1) < 1e-4)
  }

  test("partitioned read splits on the primary key and pushes filters") {
    val storms = JdbcIntake.readPartitioned(spark, url, "storms", "id",
      numPartitions = 2)
    assert(storms.rdd.getNumPartitions == 2)
    val filtered = storms.filter(col("season") >= 2018).select("nhc_id")
    assert(filtered.as[String].collect().sorted.toSeq ==
      Seq("EP162018", "WP282019"))
    // the predicate must reach the JDBC relation, not evaluate in Spark
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("season"), plan)
  }

  test("empty table degrades to a single-partition read, not a crash") {
    spark.emptyDataset[Long].toDF("id")
      .write.mode("overwrite").jdbc(url, "empty_t", new java.util.Properties)
    val df = JdbcIntake.readPartitioned(spark, url, "empty_t", "id", 4)
    assert(df.count() == 0)
  }
}
