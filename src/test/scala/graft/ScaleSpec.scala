package graft

import org.apache.spark.sql.functions._
import graft.model.GtfsTables
import graft.api.RoutingEngine
import graft.functions.TimeFunctions.formatHms

/** Scale smoke: a synthetic network in the Modena order of magnitude
  * (SURVEY §1: 249k nodes / 738k edges at full scale) driven through the
  * complete build → project → route path, including the distributed Pregel
  * branch. Catches quadratic blowups and per-row anti-patterns that the
  * mini fixture can't.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  /** 40×25 grid of stops (~255 m spacing N-S so adjacent rows are WALK_TO
    * pairs), 50 horizontal + 25 vertical routes, 12 trips each → 27k
    * stoptimes on one service day. */
  def syntheticGtfs(): GtfsTables = {
    val rows = 40
    val cols = 25
    val stops = (for (r <- 0 until rows; c <- 0 until cols) yield
      (s"S-$r-$c", s"Stop $r/$c", 44.5 + r * 0.0023, 10.8 + c * 0.01))
      .toDF("stop_id", "stop_name", "stop_lat", "stop_lon")
    // horizontal routes: one per row, west→east; vertical: one per even row-pair
    case class TripDef(routeId: String, tripId: String, stopIds: Seq[String], startSecs: Int)
    val horiz = for {
      r <- 0 until rows
      t <- 0 until 12
    } yield TripDef(s"RH-$r", s"TH-$r-$t", (0 until cols).map(c => s"S-$r-$c"),
      6 * 3600 + t * 1800 + r * 60)
    val vert = for {
      c <- 0 until cols
      t <- 0 until 12
    } yield TripDef(s"RV-$c", s"TV-$c-$t", (0 until rows).map(r => s"S-$r-$c"),
      6 * 3600 + t * 1800 + c * 90)
    val defs = horiz ++ vert
    val routes = defs.map(_.routeId).distinct.map(r => (r, r, r, 3))
      .toDF("route_id", "short_name", "route_long_name", "route_type")
    val trips = defs.map(d => (d.routeId, "SVC", d.tripId, "0", "sh", "hs"))
      .toDF("route_id", "service_id", "trip_id", "direction_id", "shape_id", "trip_headsign")
    val stopTimes = defs.flatMap { d =>
      d.stopIds.zipWithIndex.map { case (sid, i) =>
        val arr = d.startSecs + i * 120
        (d.tripId, formatHms(arr), formatHms(arr + 30), sid, i + 1, arr, arr + 30)
      }
    }.toDF("trip_id", "arrival_time", "departure_time", "stop_id", "stop_sequence",
      "arr_secs", "dep_secs")
    val calendar = Seq(("SVC", java.sql.Date.valueOf("2024-01-18"), "1"))
      .toDF("service_id", "day", "exception_type")
    val agency = Seq(("a", "u", "tz")).toDF("agency_name", "agency_url", "agency_timezone")
    GtfsTables(agency, routes, trips, stops, stopTimes, calendar)
  }

  test("Modena-order synthetic network: build, project, route end-to-end") {
    val t0 = System.nanoTime()
    val engine = new RoutingEngine(syntheticGtfs())
    val g = engine.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
    val nodes = g.nodeCount
    val edges = g.edgeCount
    info(f"projection: $nodes nodes, $edges edges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    assert(nodes == (40 * 12 * 25) + (25 * 12 * 40)) // 24 000 stoptimes
    assert(edges > nodes) // PRECEDES ≈ nodes − trips, plus CHANGE fan-out

    // cross-grid journey requiring a horizontal→vertical transfer
    val t1 = System.nanoTime()
    val seg = engine.routing("2024-01-18", 1.0, "08:00:00", "Stop 0/0", "Stop 39/24")
    val segments = seg.collect()
    val routingSecs = (System.nanoTime() - t1) / 1e9
    info(f"routing: ${segments.length} segments in $routingSecs%.1f s")
    assert(segments.nonEmpty)
    assert(engine.changeCount(seg) >= 1) // must change lines to cross the grid
    // arrival of the last segment is a valid time on the service day
    val arr = segments.last.getAs[String]("arrival")
    assert(arr > "08:00:00" && arr < "24:00:00")
    // stays comfortably inside the reference's measured 1.0–23.6 s range
    assert(routingSecs < 60.0, s"routing took $routingSecs s")
  }
}
