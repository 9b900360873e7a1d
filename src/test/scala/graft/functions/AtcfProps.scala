package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Property-based checks (SURVEY.md §5.3) run by sbt's ScalaCheck
  * framework: decode(encode(x)) round-trips for the ATCF scalar codecs.
  */
object AtcfProps extends Properties("atcf") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val latTenths = Gen.choose(-900, 900)
  private val lonTenths = Gen.choose(-1800, 1800)

  property("lat decode(encode) round-trips") = Prop.forAll(latTenths) { t =>
    val enc = s"${math.abs(t)}${if (t >= 0) "N" else "S"}"
    val got = Seq(enc).toDF("s").select(Atcf.atcfLat(col("s")))
      .as[Double].head()
    got == t / 10.0
  }

  property("lon decode(encode) round-trips") = Prop.forAll(lonTenths) { t =>
    val enc = s"${math.abs(t)}${if (t >= 0) "E" else "W"}"
    val got = Seq(enc).toDF("s").select(Atcf.atcfLon(col("s")))
      .as[Double].head()
    got == t / 10.0
  }

  property("compact datetime format(parse) round-trips") =
    Prop.forAll(Gen.choose(0L, 1900000000L)) { secs =>
      val hourSecs = secs - secs % 3600
      val df = Seq(hourSecs).toDF("s")
        .select(expr("CAST(timestamp_seconds(s) AS TIMESTAMP_NTZ)").as("ts"))
        .select(date_format(col("ts"), "yyyyMMddHH").as("enc"), col("ts"))
        .select(Atcf.parseAtcfDatetime(col("enc")).as("dec"), col("ts"))
      df.filter(col("dec") =!= col("ts")).count() == 0
    }

  property("cycleFloor lands on 00/06/12/18 and never moves forward") =
    Prop.forAll(Gen.choose(0L, 1900000000L)) { secs =>
      val got = Seq(secs).toDF("s")
        .select(col("s"), Atcf.cycleFloor(expr("timestamp_seconds(s)")).as("c"))
        .select(hour(col("c")).as("h"),
          (unix_timestamp(col("c").cast("timestamp")) <= col("s")).as("ok"),
          (col("s") - unix_timestamp(col("c").cast("timestamp"))).as("diff"))
        .collect()(0)
      got.getAs[Int]("h") % 6 == 0 && got.getAs[Boolean]("ok") &&
        got.getAs[Long]("diff") < 21600L
    }
}
