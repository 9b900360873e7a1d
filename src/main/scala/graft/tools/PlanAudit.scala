package graft.tools

import graft.{Session, SparkEntry}

/** Prints a compact physical-plan audit for each query: join strategies,
  * pushed filters, whole-stage-codegen coverage, exchange count. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.local("4")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() on THIS Dataset so its own AQE plan finalizes (a write
      // clones the plan and would leave this one isFinalPlan=false)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString()
      def count(s: String) = plan.sliding(s.length).count(_ == s)
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
        .map(j => j -> count(j)).filter(_._2 > 0)
        .map { case (j, n) => s"$j x$n" }.mkString(", ")
      val pushed = count("PushedFilters: [")
      val pushedEmpty = count("PushedFilters: []")
      val exchanges = count("Exchange ")
      // codegen'd operators print "*(stageId)" — count DISTINCT stages
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      println(f"$name%-28s joins[$joins] pushed=${pushed - pushedEmpty}/$pushed " +
        f"exchanges=$exchanges codegenSpans=$wsc")
    }
    spark.stop()
  }
}
