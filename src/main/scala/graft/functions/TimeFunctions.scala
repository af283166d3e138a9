package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GTFS time handling.
  *
  * The reference parses stop times with Cypher `time()` (`new_dbSetup.py:61`),
  * which cannot represent GTFS service-past-midnight values like "25:10:00".
  * We store seconds-since-midnight as a plain Int (SURVEY §7.4): total order,
  * exact arithmetic, no wrap. All reference arithmetic (`time + duration`,
  * `duration.inSeconds(t1,t2)`, comparisons — `main.py:17,132,140`) becomes
  * plain integer math.
  */
object TimeFunctions {

  /** Parse "H:MM:SS" / "HH:MM:SS" (hours may exceed 23) to seconds since
    * midnight. Pure column expression, codegen-friendly. */
  def secondsSinceMidnight(hms: Column): Column = {
    val p = split(hms, ":")
    (element_at(p, 1).cast("int") * 3600 +
      element_at(p, 2).cast("int") * 60 +
      element_at(p, 3).cast("int"))
  }

  /** Driver-side parse of a "HH:MM:SS" literal (e.g. a query's departure
    * time) to seconds since midnight. */
  def parseHms(s: String): Int = {
    val a = s.split(":")
    a(0).toInt * 3600 + a(1).toInt * 60 + a(2).toInt
  }

  /** Format seconds-since-midnight back to "HH:MM:SS" (hours can be ≥ 24). */
  def formatHms(secs: Int): String =
    f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d"

  /** Column version of [[formatHms]]. */
  def hmsString(secs: Column): Column =
    format_string("%02d:%02d:%02d", (secs / 3600).cast("int"),
      ((secs % 3600) / 60).cast("int"), (secs % 60).cast("int"))
}
