package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.GtfsTables

/** Day-partitioned parquet warehouse — the storage layout for the 100 TB
  * posture (SURVEY §4.1/§7.3).
  *
  * The reference's Day-node uniqueness + index is what lets Neo4j anchor
  * every query at one calendar day. Our analog is physical: the
  * day-expanded stoptime table (stoptime × valid service day) written
  * `partitionBy("day")`, so a projection for one day reads exactly one
  * partition (partition pruning — no index structure needed). Dimensions
  * (stops, routes, trips, calendar) stay unpartitioned small parquet.
  *
  * At 100 TB the day-expanded table is the only large relation, and every
  * downstream join in TimeExpandedGraph.build shuffles day-local data only.
  */
object GtfsWarehouse {

  /** Expand stoptimes by valid service day: one row per (stoptime, day).
    * Carries the precomputed per-trip `ride_acum` prefix (day-independent —
    * see TimeExpandedGraph.withRideAcum): one window at write time buys
    * every projection build a window-free read, so the stop-bucketed scan
    * feeds the CHANGE build with its partitioning intact. */
  def dayExpandedStopTimes(g: GtfsTables): DataFrame = {
    val dayTrips = g.trips
      .join(g.calendar.select("service_id", "day"), Seq("service_id"))
      .select("trip_id", "route_id", "service_id", "day")
    graft.projection.TimeExpandedGraph.withRideAcum(g.stopTimes)
      .join(dayTrips, Seq("trip_id"))
  }

  /** Write the warehouse: day-partitioned expanded stoptimes + dimensions. */
  def write(g: GtfsTables, dir: String): Unit = {
    dayExpandedStopTimes(g).write.mode("overwrite")
      .partitionBy("day").parquet(s"$dir/day_stoptimes")
    writeDims(g, dir)
  }

  /** Dimensions only (stops, routes, trips, calendar, agency) — for a
    * warehouse whose fact side is written bucketed via
    * [[writeBucketedByStop]]: writing the PLAIN day table too would
    * compute and persist the day expansion twice for one read path (r20 —
    * `gtfs_routing_bucketed` paid both writes and read only the bucketed
    * one; at 100 TB the duplicate expansion is the dominant write). */
  def writeDims(g: GtfsTables, dir: String): Unit = {
    g.agency.write.mode("overwrite").parquet(s"$dir/agency")
    g.stops.write.mode("overwrite").parquet(s"$dir/stops")
    g.routes.write.mode("overwrite").parquet(s"$dir/routes")
    g.trips.write.mode("overwrite").parquet(s"$dir/trips")
    g.calendar.write.mode("overwrite").parquet(s"$dir/calendar")
  }

  /** Read one service day — Catalyst prunes to the single day= partition
    * (verify with `.inputFiles`: only day=<d> paths appear). */
  def loadDay(spark: SparkSession, dir: String, day: java.sql.Date): DataFrame =
    spark.read.parquet(s"$dir/day_stoptimes").filter(col("day") === lit(day))

  /** Rebuild GtfsTables from a written warehouse for ONE service day: the
    * engine's full query surface (projection, routing, metrics) runs off
    * the day-pruned partition + dimensions — at 100 TB this reads one
    * day directory, never the whole expanded table. The day filter is
    * required: the expanded table repeats each stoptime once per valid
    * day, so the unfiltered frame would duplicate rows in the projection
    * joins. */
  def loadTables(spark: SparkSession, dir: String, day: java.sql.Date): GtfsTables =
    GtfsTables(
      agency = spark.read.parquet(s"$dir/agency"),
      routes = spark.read.parquet(s"$dir/routes"),
      trips = spark.read.parquet(s"$dir/trips"),
      stops = spark.read.parquet(s"$dir/stops"),
      stopTimes = loadDay(spark, dir, day).drop("route_id", "service_id", "day"),
      calendar = spark.read.parquet(s"$dir/calendar"))

  /** Bucketed twin of the day-expanded table, keyed by stop_id: the
    * CHANGE-candidate joins (stoptime ↔ WALK_TO ↔ stoptime) are all
    * stop-keyed equi-joins, so two bucketed sides co-locate and the
    * projection's dominant Exchange disappears — the 100 TB shuffle
    * killer. Day-partitioned on top, so a projection still reads one
    * day directory (partition pruning) AND scans it pre-distributed on
    * stop_id (bucket co-location). Bucketing needs a catalog entry
    * (saveAsTable); `path` makes it an external table so the data lands
    * where the caller says. */
  def writeBucketedByStop(g: GtfsTables, tableName: String, path: String,
      buckets: Int = 32): Unit =
    dayExpandedStopTimes(g).write.mode("overwrite")
      .option("path", path)
      .partitionBy("day")
      .bucketBy(buckets, "stop_id")
      .sortBy("stop_id")
      .saveAsTable(tableName)

  /** Rebuild GtfsTables for ONE day off the bucketed warehouse table:
    * the stoptime side of every projection join arrives pre-distributed
    * on stop_id straight from the scan, so TimeExpandedGraph.build's
    * CHANGE-candidate join shuffles neither big side — only the (small)
    * WALK_TO fan-out redistributes. This is the production 100 TB path;
    * `loadTables` (plain layout) keeps working where no catalog table
    * exists. Dimensions still come from the plain parquet dir. */
  def loadTablesBucketed(spark: SparkSession, tableName: String, dir: String,
      day: java.sql.Date): GtfsTables =
    GtfsTables(
      agency = spark.read.parquet(s"$dir/agency"),
      routes = spark.read.parquet(s"$dir/routes"),
      trips = spark.read.parquet(s"$dir/trips"),
      stops = spark.read.parquet(s"$dir/stops"),
      stopTimes = spark.table(tableName).filter(col("day") === lit(day))
        .drop("route_id", "service_id", "day"),
      calendar = spark.read.parquet(s"$dir/calendar"))

  /** Remove a scratch warehouse directory (temp-dir hygiene for the
    * catalog queries / tools that round-trip through a throwaway layout). */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
