package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression ports of the reference's per-value validators
  * (tcdb/validation.py). The reference's quirky defaults are preserved
  * exactly (e.g. invalid/missing pressure -> literal 1000, pressure 0 kept
  * for track-only models); `raise_on_fail` maps to counting violations
  * instead of throwing per-row.
  */
object Validators {

  /** null -> 1000; [850,1050] or 0 -> keep; else -> 1000.
    * (tcdb/validation.py:6-20)
    */
  def validatePressure(c: Column): Column =
    when(c.isNull, lit(1000.0))
      .when((c >= 850 && c <= 1050) || c === 0, c)
      .otherwise(lit(1000.0))

  /** [0,250] -> keep; else null. (tcdb/validation.py:23-32) */
  def validateVelocity(c: Column): Column =
    when(c >= 0 && c <= 250, c).otherwise(lit(null))

  /** [-90,90] -> keep; else null. (tcdb/validation.py:35-44) */
  def validateLatitude(c: Column): Column =
    when(c >= -90 && c <= 90, c).otherwise(lit(null))

  /** [-180,180] -> keep; else null. (tcdb/validation.py:47-56) */
  def validateLongitude(c: Column): Column =
    when(c >= -180 && c <= 180, c).otherwise(lit(null))

  /** null stays null; >=0 -> keep; else null. (tcdb/validation.py:59-66) */
  def validateDistance(c: Column): Column =
    when(c >= 0, c).otherwise(lit(null))

  /** [0,360] -> keep; else null. (tcdb/validation.py:69-76) */
  def validateDirection(c: Column): Column =
    when(c >= 0 && c <= 360, c).otherwise(lit(null))

  /** >=0 -> keep; else null. (tcdb/validation.py:79-88) */
  def validateForecastStep(c: Column): Column =
    when(c >= 0, c).otherwise(lit(null))

  /** Count of rows a raise_on_fail=True validator would have thrown on. */
  def violations(c: Column, lo: Double, hi: Double): Column =
    sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
}
