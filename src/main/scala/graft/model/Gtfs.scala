package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** GTFS input schemas — exactly the columns the reference's ETL dereferences
  * (`new_dbSetup.py:33-63`, `reshape.py`; see FIXTURES.md §1, including its
  * two deviations from stock GTFS: `short_name` on routes, positional
  * service_id in trips). Schema-on-read strings cast explicitly at load, no
  * inference — deterministic at any scale.
  */
object GtfsSchemas {
  val agency: StructType = StructType(Seq(
    StructField("agency_name", StringType),
    StructField("agency_url", StringType),
    StructField("agency_timezone", StringType)))

  val routes: StructType = StructType(Seq(
    StructField("route_id", StringType),
    StructField("short_name", StringType),
    StructField("route_long_name", StringType),
    StructField("route_type", IntegerType)))

  val trips: StructType = StructType(Seq(
    StructField("route_id", StringType),
    StructField("service_id", StringType),
    StructField("trip_id", StringType),
    StructField("direction_id", StringType),
    StructField("shape_id", StringType),
    StructField("trip_headsign", StringType)))

  val stops: StructType = StructType(Seq(
    StructField("stop_id", StringType),
    StructField("stop_name", StringType),
    StructField("stop_lat", DoubleType),
    StructField("stop_lon", DoubleType)))

  /** Times kept as raw strings here; the loader converts to
    * seconds-since-midnight Int (GTFS allows ≥ 24:00:00 — SURVEY §7.4). */
  val stopTimes: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("arrival_time", StringType),
    StructField("departure_time", StringType),
    StructField("stop_id", StringType),
    StructField("stop_sequence", IntegerType)))

  val calendarDates: StructType = StructType(Seq(
    StructField("service_id", StringType),
    StructField("date", StringType),
    StructField("exception_type", StringType)))
}

/** The loaded GTFS dataset: one DataFrame per node label of the reference's
  * property graph (SURVEY §1.1). `stopTimes` carries `arr_secs`/`dep_secs`
  * Int columns; `calendar` is the reshaped (service_id, day, exception_type)
  * table (reshape.py semantics).
  */
final case class GtfsTables(
    agency: DataFrame,
    routes: DataFrame,
    trips: DataFrame,
    stops: DataFrame,
    stopTimes: DataFrame,
    calendar: DataFrame)
