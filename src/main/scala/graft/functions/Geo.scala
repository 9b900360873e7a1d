package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle (haversine) distance as a pure column expression.
  *
  * Reference semantics: tcdb/utils.py:49-69 — arcsin-haversine with unit
  * conversions (nautical miles, km, miles, degrees).
  */
object Geo {
  private val Rad = math.Pi / 180.0

  /** Central angle in radians between two (lat, lon) points in degrees. */
  def centralAngle(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = lat1 * Rad
    val p2 = lat2 * Rad
    val l1 = lon1 * Rad
    val l2 = lon2 * Rad
    lit(2.0) * asin(sqrt(
      pow(sin((p1 - p2) / 2), 2) + cos(p1) * cos(p2) * pow(sin((l1 - l2) / 2), 2)))
  }

  /** Distance in the requested unit: "nm" | "km" | "mi" | "degrees". */
  def greatCircle(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
      units: String = "nm"): Column = {
    val deg = centralAngle(lat1, lon1, lat2, lon2) * (180.0 / math.Pi)
    units match {
      case "nm"      => deg * 60.0
      case "km"      => deg * 60.0 * 1.852
      case "mi"      => deg * 60.0 * 1.15077945
      case "degrees" => deg
      case other     => throw new IllegalArgumentException(s"unit: $other")
    }
  }
}
