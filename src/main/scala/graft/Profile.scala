package graft

/** Ad-hoc profiler: time named queries (args) with N warm repeats and
  * optionally print the formatted plan. Usage:
  *   runMain graft.Profile <sfDir> <repeats> [explain] q1 q2 ...
  * With no query names: all queries, sorted by time desc.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val repeats = args.lift(1).map(_.toInt).getOrElse(2)
    val explain = args.contains("explain")
    val names = args.drop(2).filterNot(_ == "explain")
    val spark = Session.local()
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names.nonEmpty) names.toSeq.map(n => n -> SparkEntry.queries(n))
      else SparkEntry.queries.toSeq.sortBy(_._1)
    val times = qs.map { case (name, fn) =>
      if (explain) fn(spark, sfDir).explain("formatted")
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> ts.min
    }
    times.sortBy(-_._2).foreach { case (n, t) => println(f"$t%8.2fs  $n") }
    spark.stop()
  }
}
