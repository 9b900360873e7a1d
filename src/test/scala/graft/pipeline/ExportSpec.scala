package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("init mode: headerless with \\N nulls; validation mode: headered") {
    val df = Seq((1L, Some("a"), Some(1.5)), (2L, None, None))
      .toDF("k", "s", "v")
    val initDir = Files.createTempDirectory("exp_init")
    val valDir = Files.createTempDirectory("exp_val")
    Export.csv(df, initDir.toString, "init")
    Export.csv(df, valDir.toString, "validation")

    def lines(dir: java.nio.file.Path): Seq[String] =
      Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".csv"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
        .toSeq.sorted

    val init = lines(initDir)
    assert(init == Seq("1,a,1.5", "2,\\N,\\N"))
    val val_ = lines(valDir)
    assert(val_.contains("k,s,v"))
    assert(val_.exists(_.startsWith("1,a")))
    intercept[IllegalArgumentException](Export.csv(df, "/tmp/x", "bogus"))
  }
}
