package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** Randomized cross-validation of independent formulations:
  *  - custom TopKPerGroup vs the window row_number filter;
  *  - batch lag/cumsum sessionization vs the engine-native
  *    `session_window` gap-merge (exercised in BATCH mode — same operator
  *    the streaming path uses).
  * Each property pits two implementations that share no code against the
  * same random input, so a semantics drift in either one fails the suite.
  */
object EquivalenceProps extends Properties("equivalence") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // each case runs Spark jobs; 15 random cases per property keeps the
  // suite fast while still sweeping sizes, ks, and gap layouts
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val topkInput = for {
    n <- Gen.choose(5, 60)
    k <- Gen.choose(1, 4)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, 4)
      v <- Gen.choose(0, 15)
    } yield (g, v))
  } yield (k, rows.zipWithIndex.map { case ((g, v), id) => (g, v, id) })

  property("TopKPerGroup == window row_number filter") =
    Prop.forAll(topkInput) { case (k, rows) =>
      val df = rows.toDF("g", "v", "id").repartition(3)
      val native = graft.plans.TopK
        .perGroup(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      // rank() over a total order == row_number, and rank() is NOT
      // touched by the rewrite rule — an independent reference
      val viaWindow = df.withColumn("rn", rank().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      native == viaWindow
    }

  private val sessionInput = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1, 3)
      minutes <- Gen.choose(0, 600)
    } yield (u, minutes))
  } yield rows.distinct.zipWithIndex
    .map { case ((u, m), id) => (id.toLong, u.toLong, m) }

  property("gap sessionize == native session_window (batch)") =
    Prop.forAll(sessionInput) { rows =>
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = rows.map { case (id, u, m) =>
        (id, u, new Timestamp(base + m * 60000L))
      }.toDF("event_id", "user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
      val viaGap = OlapOps.sessionizeEvents(ev)
        .select("user_id", "n_events", "session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[java.time.LocalDateTime](2))).toSet
      val viaNative = ev
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"), col("w.start").as("session_start"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[java.time.LocalDateTime](2))).toSet
      viaGap == viaNative
    }
}
