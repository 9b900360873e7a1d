package graft.tools

import graft.{Session, SparkEntry}

/** Scale-up probe: replicate sf0.1 `factor`x with re-keyed unique ids
  * (~5M lineitem rows at 8x), run representative queries at both scales,
  * and report the runtime ratio — evidence for "does this plan survive a
  * scale-up", not just "does it pass at test size".
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/sfx$factor"
    val spark = Session.local()
    Replicate.build(spark, src, dst, factor)

    val defaultProbes = Seq("q_agg_pricing_summary", "q_join_5way",
      "q_window_running", "q_join_asof", "q_agg_count_distinct",
      "q_dedup_simhash", "q_text_tokens", "q_merge_upsert",
      "q_topk_per_group", "q_sessionize", "q_agg_rollup",
      "q_dedup_groups_portable", "q_window_range_frame", "q_agg_string_agg",
      "q_curation_pipeline")
    // optional trailing args narrow the probe list (32x runs skip the
    // intentionally-quadratic raw pair-enumeration probes)
    val probes =
      if (args.length > 1) args.drop(1).toSeq else defaultProbes
    probes.foreach { name =>
      val fn = SparkEntry.queries(name)
      def time(dir: String): Double = {
        fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val base = time(src)
      val big = time(dst)
      println(f"[scale] $name%-26s sf0.1=${base}%6.2fs  x$factor=${big}%7.2fs  ratio=${big / base}%5.1f (data x$factor)")
    }
    spark.stop()
  }
}
