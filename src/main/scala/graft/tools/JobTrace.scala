package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{Session, SparkEntry}

/** Diagnostic: run one named query and print every Spark job it launches
  * (description, duration) — the tool for finding sequential-barrier and
  * recompute pathologies that per-query wall time can't localize. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_dedup_incremental")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Session.local()
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var jobLog = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.details.linesIterator
          .filter(_.contains("graft")).take(1).mkString).getOrElse("")
        // per stage: task count + the most operator-like RDD scope names
        // (project/aggregate/exchange/...) so a job is identifiable
        // without the Spark UI
        val names = j.stageInfos.map { s =>
          val ops = s.rddInfos.flatMap(_.scope)
            .flatMap(_.name.split("\\n")).map(_.takeWhile(_ != ' '))
            .filterNot(n => n.isEmpty || n == "WholeStageCodegen" ||
              n == "mapPartitionsInternal")
            .distinct.take(4).mkString("+")
          s"${s.numTasks}t:$ops"
        }.mkString(" | ")
        starts(j.jobId) = (System.nanoTime(),
          s"${j.stageInfos.size} stages [$names] $site".take(240))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobLog ::= f"  job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2fs  $d"
        }
    })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      jobLog = Nil
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — give queued JobEnd events time to
      // drain before reading/clearing, or jobs bleed into the next run
      Thread.sleep(1000)
      println(f"run $r: $dt%.2fs, ${jobLog.size} jobs")
      jobLog.reverse.foreach(println)
    }
    spark.stop()
  }
}
