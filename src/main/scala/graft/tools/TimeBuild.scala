package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: sub-phase timing inside TimeExpandedGraph.build at Modena
  * cardinality (temporary probe). */
object TimeBuild {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).repartition(4).count()

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val g = phase("modena gen (lazy frames)") { graft.etl.SyntheticGtfs.modena(spark) }
    phase("stopTimes.count (lineage)") { g.stopTimes.count() }
    val gc = phase("cache inputs") {
      val c = g.copy(stopTimes = g.stopTimes.cache(), trips = g.trips.cache(),
        stops = g.stops.cache(), calendar = g.calendar.cache())
      c.stopTimes.count(); c.trips.count(); c.stops.count(); c.calendar.count(); c
    }
    val walk = phase("walkTo materialize") {
      val w = graft.etl.GraphBuilder.walkTo(gc.stops, 300.0).localCheckpoint()
      w.count(); w
    }
    val day = java.sql.Date.valueOf("2024-01-18")
    val proj = phase("build() cached-input edges.count") {
      val p = graft.projection.TimeExpandedGraph.build(gc, day, 1.0, walk)
      p.edges.count(); p
    }
    phase("second edges.count (cache hit)") { proj.edges.count() }
    proj.unpersist()
    val proj2 = phase("build() UNcached-input edges.count") {
      val p = graft.projection.TimeExpandedGraph.build(g, day, 1.0, walk)
      p.edges.count(); p
    }
    proj2.unpersist()

    // inline reconstruction of build() internals, each stage counted alone
    {
      import graft.projection.TimeExpandedGraph.nodeId
      val speed = 1.0
      val dayServices = gc.calendar.filter(col("day") === lit(day))
        .select("service_id").distinct()
      val dayTrips = gc.trips.join(broadcast(dayServices), Seq("service_id"))
        .select("trip_id", "route_id", "service_id")
      val nodes = gc.stopTimes
        .join(broadcast(dayTrips), Seq("trip_id"))
        .join(broadcast(gc.stops), Seq("stop_id"))
        .select(nodeId(col("trip_id"), col("stop_sequence")).as("id"),
          col("trip_id"), col("route_id"), col("service_id"),
          col("stop_id"), col("stop_name"),
          col("stop_lat").as("lat"), col("stop_lon").as("lon"),
          col("stop_sequence"), col("arr_secs"), col("dep_secs"))
        .cache()
      phase("  nodes cache+count") { nodes.count() }
      val precedesDay = graft.etl.GraphBuilder.precedes(gc.stopTimes)
        .join(broadcast(dayTrips.select("trip_id")), Seq("trip_id"))
        .select(nodeId(col("trip_id"), col("src_seq")).as("source"),
          nodeId(col("trip_id"), col("dst_seq")).as("target"),
          lit("PRECEDES").as("type"), col("waiting_time"),
          lit(0L).as("walking_time"))
      phase("  precedesDay.count") { precedesDay.count() }
      val s = nodes.select(col("id").as("s_id"), col("trip_id").as("s_trip"),
        col("route_id").as("s_route"), col("service_id").as("s_service"),
        col("stop_id").as("s_stop"), col("arr_secs").as("s_arr"))
      val w = walk.select(col("src_stop_id").as("n_stop"),
        col("dst_stop_id").as("s_stop"), col("distance"))
      val tgt = nodes.select(col("id").as("t_id"),
        col("route_id").as("t_route"), col("service_id").as("t_service"),
        col("stop_id").as("n_stop"), col("dep_secs").as("t_dep"))
      val sched = tgt.groupBy("n_stop", "t_service", "t_route")
        .agg(sort_array(collect_list(struct(col("t_dep"), col("t_id")))).as("deps"))
      phase("  sched.count") { sched.count() }
      val walkSecs = floor(col("distance") / speed).cast("long")
      val probed = s.join(w, Seq("s_stop")).join(sched, Seq("n_stop"))
        .filter(col("t_service") === col("s_service") &&
          col("t_route") =!= col("s_route"))
        .withColumn("walking_time", walkSecs)
        .withColumn("reachable", filter(col("deps"),
          d => d.getField("t_dep") > col("s_arr") + col("walking_time")))
        .withColumn("min_dep", get(col("reachable"), lit(0)).getField("t_dep"))
        .select(col("s_id"), col("s_arr"), col("t_route"), col("distance"),
          col("walking_time"),
          explode(filter(col("reachable"),
            d => d.getField("t_dep") === col("min_dep"))).as("e"))
        .select(col("s_id"), col("s_arr"), col("t_route"), col("distance"),
          col("walking_time"), col("e.t_dep").as("t_dep"), col("e.t_id").as("t_id"))
      phase("  probed.count") { probed.count() }
      val joined0 = s.join(w, Seq("s_stop")).join(sched, Seq("n_stop"))
        .filter(col("t_service") === col("s_service") &&
          col("t_route") =!= col("s_route"))
      phase("  join only (no lambdas)") { joined0.count() }
      phase("  join bcast (no lambdas)") {
        s.join(broadcast(w), Seq("s_stop")).join(broadcast(sched), Seq("n_stop"))
          .filter(col("t_service") === col("s_service") &&
            col("t_route") =!= col("s_route")).count() }
      phase("  + reachable filter only") {
        joined0.withColumn("walking_time", walkSecs)
          .withColumn("reachable", filter(col("deps"),
            d => d.getField("t_dep") > col("s_arr") + col("walking_time")))
          .select(col("s_id"), size(col("reachable")).as("k")).count() }
      val earliest = org.apache.spark.sql.expressions.Window
        .partitionBy("s_id", "t_route", "distance").orderBy("t_dep")
      val changeEdges = probed.withColumn("rk", rank().over(earliest))
        .filter(col("rk") === 1)
        .select(col("s_id").as("source"), col("t_id").as("target"),
          lit("CHANGE").as("type"),
          (col("t_dep") - col("s_arr") + col("walking_time")).cast("long")
            .as("waiting_time"), col("walking_time"))
      phase("  changeEdges.count") { changeEdges.count() }
      phase("  union.count (uncached)") { changeEdges.unionByName(precedesDay).count() }
      phase("  union.cache.count") {
        changeEdges.unionByName(precedesDay).cache().count() }
      nodes.unpersist()
    }
    spark.stop()
  }
}
