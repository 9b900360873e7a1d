package graft.tools

import graft.{Session, SparkEntry}

/** Same-JVM A/B of the EditJoin candidate-verify plan shapes
  * (`-Dgraft.editjoin.verify=condition|project`, see
  * [[graft.similarity.EditJoin]]): runs each named query alternating
  * form per repeat (A,B,A,B,...) so JIT/page-cache drift hits both arms
  * equally, reports per-form min/median, and prints how many
  * `levenshtein` instances each form's EXECUTED physical plan contains
  * (the round-12 hypothesis was that the project form halves kernel
  * evaluations; the optimizer's PushPredicateThroughJoin may make the
  * two forms literally the same plan).
  *
  * Usage: runMain graft.tools.AbFuzzy [sfDir] [reps] [names...]
  */
object AbFuzzy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_join_fuzzy", "q_entity_resolution")
    val spark = Session.local()
    spark.sparkContext.setLogLevel("ERROR")

    def withForm[T](form: String)(f: => T): T = {
      val prev = sys.props.get("graft.editjoin.verify")
      sys.props("graft.editjoin.verify") = form
      try f finally prev match {
        case Some(v) => sys.props("graft.editjoin.verify") = v
        case None => sys.props.remove("graft.editjoin.verify")
      }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // plan census first (cheap: one execution per form)
      for (form <- Seq("condition", "project")) withForm(form) {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        val nLev = "levenshtein".r.findAllIn(plan).length
        val filterAboveJoin = plan.linesIterator
          .exists(l => l.contains("Filter") && l.contains("levenshtein"))
        println(s"$name [$form] plan: $nLev levenshtein nodes; " +
          s"standalone levenshtein Filter present: $filterAboveJoin")
      }
      val times = collection.mutable.Map(
        "condition" -> List.empty[Double], "project" -> List.empty[Double])
      for (r <- 1 to reps; form <- Seq("condition", "project")) {
        val t = withForm(form) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        times(form) ::= t
        println(f"$name [$form] rep $r: $t%.2fs")
      }
      for (form <- Seq("condition", "project")) {
        val ts = times(form).sorted
        println(f"$name [$form] min=${ts.head}%.2fs " +
          f"median=${ts(ts.size / 2)}%.2fs over $reps reps")
      }
    }
    spark.stop()
  }
}
