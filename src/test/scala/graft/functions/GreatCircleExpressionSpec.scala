package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.expressions.GreatCircleDistance

class SqlFunctionRegistrationSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("native expressions are callable from SQL (SparkSessionExtensions)") {
    val r = spark.sql(
      """SELECT great_circle(26.8D, -82.3D, 27.1D, -82.9D) AS d,
        |cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |cosine_similarity(array(1.0D), array(1.0D, 2.0D)) AS n""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 37.0) < 2.0) // ~0.6 deg separation
    assert(r.getDouble(1) == 1.0)
    assert(r.isNullAt(2)) // mismatched lengths -> NULL contract
  }
}

class GreatCircleExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val pts = (1 to 500).map { i =>
    ((i % 120) / 2.0 - 30.0, (i % 300) / 2.0 - 75.0,
      (i % 110) / 2.0 - 25.0, (i % 250) / 2.0 - 60.0)
  }.toDF("lat1", "lon1", "lat2", "lon2")

  test("native expression is bit-identical to the composed Column form") {
    val diff = pts.select(
      GreatCircleDistance.greatCircleNative(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("native"),
      Geo.greatCircle(col("lat1"), col("lon1"), col("lat2"), col("lon2"), "nm")
        .as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff == 0)
  }

  test("nulls propagate") {
    val r = Seq((Some(1.0), None: Option[Double]))
      .toDF("a", "b")
      .select(GreatCircleDistance.greatCircleNative(
        col("a"), col("b"), col("a"), col("a")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("SQL registration works end-to-end") {
    GreatCircleDistance.register(spark)
    pts.createOrReplaceTempView("gc_pts")
    val n = spark.sql(
      """SELECT great_circle(lat1, lon1, lat2, lon2) AS d FROM gc_pts
        |WHERE great_circle(lat1, lon1, lat2, lon2) >= 0""".stripMargin).count()
    assert(n == 500)
  }

  test("interpreted eval path (codegen fallback) agrees") {
    // force the interpreted path via eval on the expression itself
    val e = GreatCircleDistance(
      org.apache.spark.sql.catalyst.expressions.Literal(25.76),
      org.apache.spark.sql.catalyst.expressions.Literal(-80.19),
      org.apache.spark.sql.catalyst.expressions.Literal(23.11),
      org.apache.spark.sql.catalyst.expressions.Literal(-82.37))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 198.6) < 2.0)
  }

  test("cosine native expression is bit-identical to the composed fold") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") <= col("ia") + 3)
    val diff = pairs.select(
        graft.functions.expressions.CosineSimilarity
          .cosineNative(col("va"), col("vb")).as("native"),
        Vectors.cosine(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff == 0)
  }

  test("cosine native rejects non-array inputs") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(
        graft.functions.expressions.CosineSimilarity
          .cosineNative(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array")
      || err.getMessage.contains("DATATYPE"))
  }
}
