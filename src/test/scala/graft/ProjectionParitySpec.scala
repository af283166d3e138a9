package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The projection's CHANGE edges come from a two-stage selection (per-stop
  * schedule-array probe, then a rank window across equidistant stops —
  * TimeExpandedGraph.build). This spec pins it against the NAIVE one-stage
  * formulation — expand s ⋈ walk ⋈ stoptimes, rank over (s_id, t_route,
  * distance), keep ties — on a regular grid network, where equidistant
  * neighbor stops (the case the second stage exists for) are common, plus
  * the demo fixture (service boundaries, same-stop transfers past
  * midnight). Edge sets must match EXACTLY, including tied targets. */
class ProjectionParitySpec extends SparkSpec {

  /** The reference formulation, kept deliberately naive (the shape the
    * rewrite replaced): one big expansion + one rank window. */
  private def naiveChange(nodes: DataFrame, walkToEdges: DataFrame,
      speed: Double): DataFrame = {
    val s = nodes.select(col("id").as("s_id"), col("trip_id").as("s_trip"),
      col("route_id").as("s_route"), col("service_id").as("s_service"),
      col("stop_id").as("s_stop"), col("arr_secs").as("s_arr"))
    val walk = walkToEdges.select(col("src_stop_id").as("n_stop"),
      col("dst_stop_id").as("s_stop"), col("distance"))
    val tgt = nodes.select(col("id").as("t_id"), col("trip_id").as("t_trip"),
      col("route_id").as("t_route"), col("service_id").as("t_service"),
      col("stop_id").as("n_stop"), col("dep_secs").as("t_dep"))
    val walkSecs = floor(col("distance") / speed).cast("long")
    val candidates = s.join(walk, Seq("s_stop")).join(tgt, Seq("n_stop"))
      .filter(col("t_service") === col("s_service") &&
        col("t_trip") =!= col("s_trip") &&
        col("t_route") =!= col("s_route") &&
        col("s_arr") + walkSecs < col("t_dep"))
      .withColumn("walking_time", walkSecs)
    val earliest = Window.partitionBy("s_id", "t_route", "distance").orderBy("t_dep")
    candidates.withColumn("rk", rank().over(earliest)).filter(col("rk") === 1)
      .select(col("s_id").as("source"), col("t_id").as("target"),
        lit("CHANGE").as("type"),
        (col("t_dep") - col("s_arr") + col("walking_time")).cast("long").as("waiting_time"),
        col("walking_time"))
  }

  private def changeEdgeSet(edges: DataFrame): Set[String] =
    edges.filter(col("type") === "CHANGE")
      .select("source", "target", "waiting_time", "walking_time")
      .collect().map(_.toString).toSet

  private def assertParity(gtfs: graft.model.GtfsTables, speed: Double): Unit = {
    val day = java.sql.Date.valueOf("2024-01-18")
    val walk = graft.etl.GraphBuilder.walkTo(gtfs.stops, 300.0).localCheckpoint()
    val g = graft.projection.TimeExpandedGraph.build(gtfs, day, speed, walk)
    try {
      val fast = changeEdgeSet(g.edges)
      val naive = changeEdgeSet(naiveChange(g.nodes, walk, speed))
      assert(fast.nonEmpty)
      assert(fast == naive,
        s"missing=${(naive -- fast).take(5)} extra=${(fast -- naive).take(5)}")
    } finally g.unpersist()
  }

  test("grid network (equidistant neighbors): schedule probe == naive rank") {
    assertParity(graft.etl.SyntheticGtfs.grid(spark, rows = 8, cols = 6,
      tripsPerRoute = 4), speed = 1.0)
  }

  test("demo fixture at a non-unit walking speed") {
    assertParity(graft.api.DemoGtfs.tables(spark), speed = 1.4)
  }
}
