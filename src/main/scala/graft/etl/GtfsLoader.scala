package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{GtfsSchemas, GtfsTables}
import graft.functions.TimeFunctions.secondsSinceMidnight

/** GTFS CSV → typed DataFrames. Replaces the reference's `new_dbSetup.py`
  * LOAD CSV ingests (S1) + `reshape.py` calendar preprocessor (S3).
  *
  * The reference batches the two big files through
  * `apoc.periodic.iterate(batchSize:1000, parallel:true)`
  * (`new_dbSetup.py:59-63,87-91`) purely because of Neo4j transaction
  * limits; Spark partitions the scan natively, so batching disappears
  * (SURVEY §3.1).
  */
object GtfsLoader {

  /** Column-name fallbacks: real feeds write `route_short_name`; the model
    * (and the mini fixture) use `short_name`. */
  private val aliases: Map[String, Seq[String]] = Map(
    "short_name" -> Seq("route_short_name"))

  /** GTFS-optional columns: absent from some real feeds; loaded as null
    * rather than failing (nothing downstream keys on them). */
  private val optional: Set[String] = Set("direction_id", "shape_id", "trip_headsign")

  /** Header-driven CSV read: columns are resolved BY NAME and cast to the
    * model schema, so real-world feeds with extra columns (stop_code,
    * pickup_type, route_color, …) or a different column order load
    * correctly — a positional schema would silently misparse them. All
    * columns arrive as strings (no inference pass over the big
    * stop_times file); required columns missing from the header fail
    * loudly. */
  private def csv(spark: SparkSession, dir: String, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val raw0 = spark.read.option("header", "true").csv(s"$dir/$name")
    // real-world exports often lead with a UTF-8 BOM, which lands inside
    // the first header name and breaks by-name resolution
    val raw = raw0.columns.headOption.filter(_.startsWith("\uFEFF"))
      .map(c => raw0.withColumnRenamed(c, c.stripPrefix("\uFEFF")))
      .getOrElse(raw0)
    val have = raw.columns.toSet
    val cols = schema.fields.map { f =>
      (f.name +: aliases.getOrElse(f.name, Nil)).find(have.contains) match {
        case Some(source) => col(source).cast(f.dataType).as(f.name)
        case None if optional.contains(f.name) => lit(null).cast(f.dataType).as(f.name)
        case None => throw new IllegalArgumentException(
          s"$name: required column '${f.name}' not in header [${raw.columns.mkString(", ")}]")
      }
    }
    raw.select(cols.toSeq: _*)
  }

  /** reshape.py semantics: keep only calendar rows whose service_id occurs
    * in trips.txt, convert YYYYMMDD → a date column `day`
    * (`reshape.py:9-37`). */
  def reshapeCalendar(trips: DataFrame, calendarRaw: DataFrame): DataFrame =
    calendarRaw
      .join(trips.select("service_id").distinct(), Seq("service_id"), "left_semi")
      .select(col("service_id"), to_date(col("date"), "yyyyMMdd").as("day"),
        col("exception_type"))

  /** Load a GTFS directory (agency/routes/trips/stops/stop_times/
    * calendar_dates .txt). Times become seconds-since-midnight Ints
    * (`arr_secs`/`dep_secs`), which — unlike the reference's Cypher `time()`
    * (`new_dbSetup.py:61`) — represent GTFS service-past-midnight rows
    * (SURVEY §7.4). */
  def load(spark: SparkSession, dir: String): GtfsTables = {
    val trips = csv(spark, dir, "trips.txt", GtfsSchemas.trips)
    val stopTimes = csv(spark, dir, "stop_times.txt", GtfsSchemas.stopTimes)
      .withColumn("arr_secs", secondsSinceMidnight(col("arrival_time")))
      .withColumn("dep_secs", secondsSinceMidnight(col("departure_time")))
    GtfsTables(
      agency = csv(spark, dir, "agency.txt", GtfsSchemas.agency),
      routes = csv(spark, dir, "routes.txt", GtfsSchemas.routes),
      trips = trips,
      stops = csv(spark, dir, "stops.txt", GtfsSchemas.stops),
      stopTimes = stopTimes,
      calendar = reshapeCalendar(trips,
        csv(spark, dir, "calendar_dates.txt", GtfsSchemas.calendarDates)))
  }
}
