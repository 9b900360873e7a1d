package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurateOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("decontaminate partitions the corpus: contaminated + clean = total") {
    val rows = CurateOps.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") + r.getAs[Long]("n_clean") ==
        r.getAs[Long]("n_docs"))
    }
    // the gate is only meaningful if both classes occur
    assert(rows.map(_.getAs[Long]("n_contaminated")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_clean")).sum > 0)
  }

  test("decontaminateBloom equals the exact path; the bloom probe prunes") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Sketch
    val exact = CurateOps.decontaminate(spark, dir).collect().toSeq
    val bloom = CurateOps.decontaminateBloom(spark, dir).collect().toSeq
    assert(bloom == exact) // FPs verified away, FNs impossible
    // the prefilter must actually reject most non-benchmark shingles:
    // rebuild the blob from the op's OWN shingle pipeline and measure
    // the survivor fraction
    val docs = graft.Tables.load(spark, dir, "documents")
    val sh: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      CurateOps.docShingles4
    val benchH = sh(docs.filter(col("source") === "src0")).select("h").distinct()
    val blob = benchH.agg(Sketch.bloomAgg(col("h"), 60000L, 480000L))
      .head().getAs[Array[Byte]](0)
    val corpusSh = sh(docs.filter(col("source") =!= "src0"))
    val total = corpusSh.count()
    val surviving = corpusSh
      .filter(Sketch.bloomMightContain(blob, col("h"))).count()
    assert(surviving < total,
      s"bloom prefilter rejected nothing ($surviving of $total)")
  }

  test("qualityClassifier learns the density rule: >=90% agreement, both classes predicted") {
    val rows = CurateOps.qualityClassifier(spark, dir).collect()
    assert(rows.length == 500)
    val preds = rows.map(_.getAs[Long]("pred"))
    val ys = rows.map(_.getAs[Long]("y"))
    // non-degenerate: the fit must actually separate, not majority-vote
    assert(preds.toSet == Set(0L, 1L), s"degenerate predictions: ${preds.toSet}")
    val agree = rows.count(r => r.getAs[Long]("pred") == r.getAs[Long]("y"))
    assert(agree >= 450, s"agreement $agree/500 below 90%")
    // and better than either constant classifier
    val basePos = ys.count(_ == 1L).max(ys.count(_ == 0L))
    assert(agree > basePos, s"agreement $agree no better than base rate $basePos")
  }

  test("shardBalance: shards near-balanced in tokens, layout deterministic") {
    val rows = CurateOps.shardBalance(spark, dir).collect()
    assert(rows.length == 500)
    val byShard = rows.groupBy(_.getAs[Int]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(byShard.keySet == (0 until 8).toSet)
    val (mx, mn) = (byShard.values.max, byShard.values.min)
    // snake-dealing over the size ranking bounds the spread by roughly
    // one document; 2% is generous at 500 docs / 8 shards
    assert(mx - mn <= math.max(1L, (mx * 0.02).toLong), byShard.toString)
    // within-shard positions are a permutation 1..count
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val ps = rs.map(_.getAs[Long]("pos_in_shard")).sorted
      assert(ps.toSeq == (1L to rs.length).toSeq)
    }
    // pure function of corpus + seed: a re-run is byte-identical
    val again = CurateOps.shardBalance(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("piiRedact scrubs every planted email and phone") {
    val rows = CurateOps.piiRedact(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1)
      assert(r.getAs[Int]("n_phones") >= 1)
      val tail = r.getAs[String]("red_tail")
      assert(tail.contains("<PHONE>"), tail)
      assert(!tail.contains("@"), tail)
    }
  }

  test("textRepetition fractions are in [0,1] and distinct <= total bigrams") {
    CurateOps.textRepetition(spark, dir).collect().foreach { r =>
      assert(r.getAs[Int]("n_dist_2grams") <= r.getAs[Int]("n_2grams"))
      val f = r.getAs[Double]("dup_2gram_frac")
      assert(f >= 0.0 && f <= 1.0)
      val t = r.getAs[Double]("top_word_frac")
      assert(t > 0.0 && t <= 1.0)
    }
  }

  test("sampleStratified is deterministic and respects per-lang rates") {
    val a = CurateOps.sampleStratified(spark, dir).collect()
    val b = CurateOps.sampleStratified(spark, dir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    a.foreach { r =>
      val cap = if (r.getAs[String]("lang") == "en") 30L else 60L
      assert(r.getAs[Long]("bucket") < cap)
    }
  }

  test("embedQuantize: unit component and int8 range") {
    CurateOps.embedQuantize(spark, dir).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("u1")) <= 1.0)
      val q = r.getAs[Long]("q1")
      assert(q >= -127 && q <= 127)
      assert(r.getAs[Long]("q_l1") >= 127) // the max-abs component alone
    }
  }

  test("packSequences conserves tokens and bins start at 0 per lang") {
    val out = CurateOps.packSequences(spark, dir).collect()
    val perLang = out.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("bin")).min == 0L)
    }
    val total = out.map(_.getAs[Long]("bin_tokens")).sum
    val direct = graft.Tables.load(spark, dir, "documents")
      .select(graft.functions.Text.tokenCount(
        org.apache.spark.sql.functions.col("text")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(total == direct)
  }

  test("packSequencesChunked == packSequences: default span, one-doc " +
      "chunks, and a span that straddles every boundary") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toSeq
    val plain = canon(CurateOps.packSequences(spark, dir))
    assert(plain.nonEmpty)
    // chunkSpan=1 puts EVERY document in its own chunk (maximum stitch
    // pressure: each offset is the full prefix), span=7 forces uneven
    // mid-bin boundaries, default must match too
    for (span <- Seq(1L, 7L, 4096L))
      assert(canon(CurateOps.packSequencesChunked(spark, dir, span))
        == plain, s"chunkSpan=$span diverged from the plain running sum")
  }

  test("qualityFilterRank == qualityFilter: value-group rank reproduces " +
      "the row_number threshold exactly") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("thr"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("kept_min"),
        r.getAs[Long]("kept_max"))).toSeq
    val plain = canon(CurateOps.qualityFilter(spark, dir))
    assert(plain.nonEmpty)
    assert(canon(CurateOps.qualityFilterRank(spark, dir)) == plain)
  }

  test("aggMedianRank median lies between group min and max") {
    import org.apache.spark.sql.functions._
    val med = CurateOps.aggMedianRank(spark, dir).collect()
    val ext = graft.Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    med.foreach { r =>
      val (lo, hi) = ext(r.getString(0))
      val m = r.getAs[Double]("median_price")
      assert(m >= lo && m <= hi)
    }
  }

  test("windowNtile quartiles are 1..4 and cume_dist ends at exactly 1e6 ppm") {
    val rows = CurateOps.windowNtile(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("quartile")).toSet == Set(1, 2, 3, 4))
    assert(rows.map(_.getAs[Long]("cd_ppm")).max == 1000000L)
  }

  test("DSIR persisted model: served scores equal refit; missing model fails loudly") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("dsirspec").toString
    val store = new graft.pipeline.Store(spark, base)
    val docs = graft.Tables.load(spark, dir, "documents")
    val e = intercept[IllegalArgumentException] {
      CurateOps.scoreDsirModel(store, "m", docs)
    }
    assert(e.getMessage.contains("no persisted DSIR model"))
    CurateOps.buildDsirModel(store, "m", docs, col("source") === "src0")
    val served = CurateOps.scoreDsirModel(store, "m", docs).collect()
    val refit = CurateOps.dsirWeights(spark, dir).collect()
    assert(served.map(_.toString).sorted.toSeq ==
      refit.map(_.toString).sorted.toSeq)
  }

  test("mixtureTemperature flattens toward uniform: small sources oversample > 1") {
    val rows = CurateOps.mixtureTemperature(spark, dir).collect()
    assert(rows.length > 1)
    // α < 1 exponential smoothing must UPWEIGHT below-average sources
    // and DOWNWEIGHT above-average ones (the inverted exponent 1/T > 1
    // does the opposite — this pins the fixed semantics)
    val smallest = rows.minBy(_.getAs[Long]("src_tokens"))
    val largest = rows.maxBy(_.getAs[Long]("src_tokens"))
    assert(smallest.getAs[Double]("oversample") > 1.0, smallest)
    assert(largest.getAs[Double]("oversample") < 1.0, largest)
    // t_share is a probability distribution
    val total = rows.map(_.getAs[Double]("t_share")).sum
    assert(math.abs(total - 1.0) < 1e-4)
  }

  test("mixtureWeights: weight 1.0 iff source has exactly uniform share") {
    val rows = CurateOps.mixtureWeights(spark, dir).collect()
    assert(rows.length > 1)
    rows.foreach(r => assert(r.getAs[Long]("weight_ppm") > 0L))
    // weights reweight token mass to uniform: sum(src_tokens*weight) ~ total
    val total = rows.map(_.getAs[Long]("src_tokens")).sum.toDouble
    val re = rows.map(r =>
      r.getAs[Long]("src_tokens") * (r.getAs[Long]("weight_ppm") / 1e6)).sum
    assert(math.abs(re - total) / total < 1e-4)
  }

  test("splitLeakproof: groups atomic, near-dup edges never straddle splits") {
    import org.apache.spark.sql.functions.col
    val rows = CurateOps.splitLeakproof(spark, dir).collect()
    assert(rows.length == 500)
    val split = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // all three splits realized at fixture scale
    assert(rows.map(_.getAs[String]("split")).toSet ==
      Set("train", "val", "test"))
    // a group maps to exactly one split, and multi-doc groups exist
    // (otherwise this test degenerates to splitAssign)
    val byGroup = rows.groupBy(_.getAs[Long]("group_id"))
    assert(byGroup.exists(_._2.length > 1), "fixture has no dup groups")
    byGroup.foreach { case (g, members) =>
      assert(members.map(_.getAs[String]("split")).toSet.size == 1,
        s"group $g straddles splits")
    }
    // independent check against the RAW near-dup evidence, not the
    // group labels the op itself derived: every portable LSH edge and
    // every exact-content pair must land in one split
    val docs = graft.Tables.load(spark, dir, "documents")
    val edges = graft.dedup.Dedup.minhashLshPortable(
        docs, "text", "doc_id", 3, 32, 8, 0.2)
      .select(col("id_a"), col("id_b")).collect()
    assert(edges.nonEmpty)
    edges.foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      assert(split(a) == split(b), s"near-dup pair ($a,$b) straddles splits")
    }
  }
}
