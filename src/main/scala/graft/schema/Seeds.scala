package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dimension seed data from the reference DDL and config. */
object Seeds {

  /** Basin dimension (db/init_db_base.sql:11-18). */
  def regions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("North Atlantic", "AL", "l"),
      ("East Pacific", "EP", "e"),
      ("Central Pacific", "CP", "c"),
      ("West Pacific", "WP", "w"),
      ("Indian Ocean", "IO", "i"),
      ("Southern Hemisphere", "SH", "s"))
      .toDF("long_name", "short_name", "region_char")
  }

  /** Source organizations (db/init_db_base.sql:33-42). */
  def dataSources(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("National Hurricane Center", "NHC"),
      ("National Centers for Environmental Prediction", "NCEP"),
      ("Climate Forecast Applications Network", "CFAN"),
      ("Joint Typhoon Warning Center", "JTWC"),
      ("Japan Meteorological Agency", "JMA"))
      .toDF("long_name", "short_name")
  }

  /** The a-deck model allowlist (settings.yml:28-52). */
  val modelAllowlist: Seq[String] = Seq(
    "OFCL", "OFCI", "AVNO", "AEMN", "EMX", "EEMN", "HWRF", "HWFI", "HMON",
    "HMNI", "JTWC", "CMC", "LGEM", "SHIP", "EGRR", "HCCA", "IVCN", "TVCA",
    "FSSE", "HAFA", "HFAI", "HAFB", "HFBI")

  /** Ensemble model configs (settings.yml:1-11). */
  case class EnsembleConfig(numEns: Int, maxStep: Int, resolutionHours: Int)
  val ensembleConfigs: Map[String, EnsembleConfig] = Map(
    "ECMWF" -> EnsembleConfig(52, 360, 6),
    "NCEP"  -> EnsembleConfig(32, 384, 6))
}
