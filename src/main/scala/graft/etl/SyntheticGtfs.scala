package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.GtfsTables
import graft.functions.TimeFunctions.hmsString

/** Deterministic synthetic GTFS networks at parametric scale, for measuring
  * the routing path at the reference's cardinality (Modena: 249,052 nodes /
  * 738,424 edges, `Tesina_Reggianini.pdf` p.4) without shipping the feed.
  *
  * Topology: a rows×cols stop grid (~256 m N-S spacing so adjacent rows are
  * WALK_TO transfer pairs at the default 300 m radius, ~790 m E-W), one
  * west→east route per row, one north→south route per column,
  * `tripsPerRoute` departures per route. Stoptimes are generated
  * DISTRIBUTEDLY from `spark.range` — the generator itself scales (a
  * driver-side Seq would cap at driver heap).
  */
object SyntheticGtfs {

  def grid(spark: SparkSession, rows: Int, cols: Int, tripsPerRoute: Int,
      day: String = "2024-01-18", baseSecs: Int = 6 * 3600,
      headwaySecs: Int = 1800, hopSecs: Int = 120, directions: Int = 1,
      rowStepDeg: Double = 0.0023): GtfsTables = {
    import spark.implicits._
    import org.apache.spark.sql.Column

    val stops = (for (r <- 0 until rows; c <- 0 until cols) yield
      (s"S-$r-$c", s"Stop $r/$c", 44.5 + r * rowStepDeg, 10.8 + c * 0.01))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    val routeIds = (0 until rows).map(r => s"RH-$r") ++ (0 until cols).map(c => s"RV-$c") ++
      (if (directions == 2)
        (0 until rows).map(r => s"RHW-$r") ++ (0 until cols).map(c => s"RVN-$c")
      else Nil)
    val routes = routeIds.map(r => (r, r, r, 3))
      .toDF("route_id", "short_name", "route_long_name", "route_type")
    val trips = (for (r <- routeIds; t <- 0 until tripsPerRoute) yield
      (r, "SVC", s"T-$r-$t", "0", "sh", "hs"))
      .toDF("route_id", "service_id", "trip_id", "direction_id", "shape_id", "trip_headsign")

    // Stoptimes: one row per (route, trip, stop-along-route), derived from a
    // flat range by integer division (`div` — ANSI `/` is double division).
    // Per-route-family staggers interleave departures instead of
    // synchronizing them. `stopId(k, i)` maps (route index, position along
    // the trip) to the grid stop — reversed directions flip the position.
    def block(routePrefix: String, nRoutes: Int, len: Int, staggerSecs: Int)(
        stopId: (Column, Column) => Column): DataFrame =
      spark.range(nRoutes.toLong * tripsPerRoute * len).select(
          expr(s"id div ${tripsPerRoute.toLong * len}").cast("int").as("k"),
          expr(s"(id div $len) % $tripsPerRoute").cast("int").as("t"),
          expr(s"id % $len").cast("int").as("i"))
        .select(
          concat(lit(s"T-$routePrefix-"), col("k"), lit("-"), col("t")).as("trip_id"),
          stopId(col("k"), col("i")).as("stop_id"),
          (col("i") + 1).as("stop_sequence"),
          (lit(baseSecs) + col("t") * headwaySecs + col("k") * staggerSecs +
            col("i") * hopSecs).as("arr_secs"))
    def sid(r: Column, c: Column): Column = concat(lit("S-"), r, lit("-"), c)
    val horiz = block("RH", rows, cols, 60)((k, i) => sid(k, i))
    val vert = block("RV", cols, rows, 90)((k, i) => sid(i, k))
    val fwd = horiz.unionByName(vert)
    val both =
      if (directions == 2)
        fwd.unionByName(block("RHW", rows, cols, 75)((k, i) => sid(k, lit(cols - 1) - i)))
          .unionByName(block("RVN", cols, rows, 105)((k, i) => sid(lit(rows - 1) - i, k)))
      else fwd
    val stopTimes = both
      .withColumn("dep_secs", col("arr_secs") + 30)
      .withColumn("arrival_time", hmsString(col("arr_secs")))
      .withColumn("departure_time", hmsString(col("dep_secs")))
      .select("trip_id", "arrival_time", "departure_time", "stop_id",
        "stop_sequence", "arr_secs", "dep_secs")

    val calendar = Seq(("SVC", java.sql.Date.valueOf(day), "1"))
      .toDF("service_id", "day", "exception_type")
    val agency = Seq(("synthetic", "http://example.org", "UTC"))
      .toDF("agency_name", "agency_url", "agency_timezone")
    GtfsTables(agency, routes, trips, stops, stopTimes, calendar)
  }

  /** Modena-cardinality preset: 50×50 stops, 200 directed routes (both
    * orientations × both directions), 25 trips/route → 250,000 stoptime
    * nodes (reference graph: 249,052 nodes / 738,424 edges). Stop spacing
    * ~356 m N-S (above the 300 m walk radius) keeps WALK_TO to self-loops,
    * so CHANGE density lands near the reference's ~3 edges/node instead of
    * the walk-pair grid's ~8. Departures spread over ~16 h from 05:00. */
  /** The ZERO-TOTAL-CYCLE dirty feed (r16/r17): TB's second stoptime runs
    * 20 minutes BACKWARD (ride −1200 s) and TC boards with zero dwell, so
    * the cycle TB1 →ride TB2 →change TC1 →change TB1 telescopes to exactly
    * 0 — the one shape where the canonical min-pred tie-break provably
    * admits no tree and the router must fall back to the level-layered
    * acyclic re-resolution (TransitSssp.resolveStateAcyclic). SB/SC/SD are
    * co-located (walk 0); Start and End sit far away so the only route is
    * through the dirty core. Same fixture GtfsEngineSpec pins in-heap /
    * capped / distributed; the catalog row `gtfs_routing_zero_cycle`
    * routes it with the capped-CSR budget forced to 0 (over-budget — no
    * in-heap regime can serve) and DuckDB re-checks the itinerary. */
  def zeroCycleFeed(spark: SparkSession): GtfsTables = {
    import spark.implicits._
    import graft.functions.TimeFunctions.secondsSinceMidnight
    val agency = Seq(("A", "http://example.org", "Europe/Rome"))
      .toDF("agency_name", "agency_url", "agency_timezone")
    val routes = Seq(("R1", "1", "L1", 3), ("R2", "2", "L2", 3),
      ("R3", "3", "L3", 3))
      .toDF("route_id", "short_name", "route_long_name", "route_type")
    val trips = Seq(("R1", "S1", "TA"), ("R2", "S1", "TB"), ("R3", "S1", "TC"))
      .map { case (r, s, t) => (r, s, t, "0", "SH", "h") }
      .toDF("route_id", "service_id", "trip_id", "direction_id", "shape_id",
        "trip_headsign")
    val stops = Seq(
      ("SA", "Start", 44.6000, 10.9000), ("SB", "Mid0", 44.6100, 10.9000),
      ("SC", "Mid1", 44.6100, 10.9000), ("SD", "Mid2", 44.6100, 10.9000),
      ("SE", "End", 44.6300, 10.9100))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    val stopTimes = Seq(
      ("TA", "14:00:00", "14:00:00", "SA", 1),
      ("TA", "14:20:00", "14:21:00", "SB", 2),
      ("TB", "14:25:00", "14:25:00", "SB", 1),
      ("TB", "14:05:00", "14:05:00", "SC", 2), // arr 14:05 < prev dep 14:25
      ("TC", "14:10:00", "14:10:00", "SD", 1), // zero dwell → cycle sums 0
      ("TC", "14:40:00", "14:41:00", "SE", 2))
      .toDF("trip_id", "arrival_time", "departure_time", "stop_id",
        "stop_sequence")
      .withColumn("arr_secs", secondsSinceMidnight(col("arrival_time")))
      .withColumn("dep_secs", secondsSinceMidnight(col("departure_time")))
    val calendar = Seq(("S1", java.sql.Date.valueOf("2024-01-18"), "1"))
      .toDF("service_id", "day", "exception_type")
    GtfsTables(agency, routes, trips, stops, stopTimes, calendar)
  }

  def modena(spark: SparkSession): GtfsTables =
    grid(spark, rows = 50, cols = 50, tripsPerRoute = 25,
      baseSecs = 5 * 3600, headwaySecs = 2300, hopSecs = 90, directions = 2,
      rowStepDeg = 0.0032)

  /** Hub-and-spoke stress topology (r11 verdict #6): `nSpokes` linear
    * routes of `stopsPerSpoke` stops that ALL pass through ONE shared
    * interchange stop (`HUB`) at their midpoint. Every trip of every
    * route can transfer to every other route at the hub, so the CHANGE
    * generation, the per-trip transfer fan, and the candidate
    * reduction's (src, d_trip, d_seq) key distribution are skewed far
    * beyond the uniform grid — the worst case for the distributed
    * candidate stage and for the sparse tail's trip-adjacency expansion
    * (the hub makes the trip graph near-complete, so the expansion
    * budget must trip and fall back). Spokes radiate from the hub with
    * ~700 m stop spacing (above the 300 m walk radius → WALK_TO stays
    * self-loops); stop i of spoke k sits at radius |i − mid| on bearing
    * 2πk/nSpokes. Stoptimes are generated distributedly from
    * spark.range like [[grid]]. */
  def hub(spark: SparkSession, nSpokes: Int, stopsPerSpoke: Int,
      tripsPerRoute: Int, day: String = "2024-01-18",
      baseSecs: Int = 6 * 3600, headwaySecs: Int = 115,
      hopSecs: Int = 90): GtfsTables = {
    import spark.implicits._
    require(stopsPerSpoke >= 3, "a spoke needs stops on both sides of the hub")
    val mid = stopsPerSpoke / 2
    val stops = ((for (k <- 0 until nSpokes; i <- 0 until stopsPerSpoke
                       if i != mid) yield {
      val theta = 2.0 * math.Pi * k / nSpokes
      val r = 0.0063 * (i - mid) // ~700 m per hop
      (s"S-$k-$i", s"Spoke $k/$i",
        44.5 + r * math.cos(theta), 10.8 + r * math.sin(theta))
    }) :+ (("HUB", "Hub", 44.5, 10.8)))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    val routeIds = (0 until nSpokes).map(k => s"RS-$k")
    val routes = routeIds.map(r => (r, r, r, 3))
      .toDF("route_id", "short_name", "route_long_name", "route_type")
    val trips = (for (r <- routeIds; t <- 0 until tripsPerRoute) yield
      (r, "SVC", s"T-$r-$t", "0", "sh", "hs"))
      .toDF("route_id", "service_id", "trip_id", "direction_id", "shape_id",
        "trip_headsign")
    val stopTimes = spark
      .range(nSpokes.toLong * tripsPerRoute * stopsPerSpoke)
      .select(
        expr(s"id div ${tripsPerRoute.toLong * stopsPerSpoke}")
          .cast("int").as("k"),
        expr(s"(id div $stopsPerSpoke) % $tripsPerRoute").cast("int").as("t"),
        expr(s"id % $stopsPerSpoke").cast("int").as("i"))
      .select(
        concat(lit("T-RS-"), col("k"), lit("-"), col("t")).as("trip_id"),
        when(col("i") === mid, lit("HUB"))
          .otherwise(concat(lit("S-"), col("k"), lit("-"), col("i")))
          .as("stop_id"),
        (col("i") + 1).as("stop_sequence"),
        (lit(baseSecs) + col("t") * headwaySecs + col("k") * 60 +
          col("i") * hopSecs).as("arr_secs"))
      .withColumn("dep_secs", col("arr_secs") + 30)
      .withColumn("arrival_time", hmsString(col("arr_secs")))
      .withColumn("departure_time", hmsString(col("dep_secs")))
      .select("trip_id", "arrival_time", "departure_time", "stop_id",
        "stop_sequence", "arr_secs", "dep_secs")
    val calendar = Seq(("SVC", java.sql.Date.valueOf(day), "1"))
      .toDF("service_id", "day", "exception_type")
    val agency = Seq(("synthetic-hub", "http://example.org", "UTC"))
      .toDF("agency_name", "agency_url", "agency_timezone")
    GtfsTables(agency, routes, trips, stops, stopTimes, calendar)
  }
}
