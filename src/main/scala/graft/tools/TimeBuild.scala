package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: sub-phase timing inside TimeExpandedGraph.build at Modena
  * cardinality (temporary probe; inline block mirrors the CURRENT build()
  * shape — re-sync it whenever the projection pipeline changes). */
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
      println(f"  $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
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

    // inline reconstruction of build() internals (schedAt single-join
    // shape), each stage counted alone
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
      val wTrip = org.apache.spark.sql.expressions.Window
        .partitionBy("trip_id").orderBy("stop_sequence")
      val precedesDay = nodes
        .withColumn("target", lead("id", 1).over(wTrip))
        .withColumn("dst_arr", lead("arr_secs", 1).over(wTrip))
        .filter(col("target").isNotNull)
        .select(col("id").as("source"), col("target"),
          lit("PRECEDES").as("type"),
          (col("dst_arr") - col("dep_secs")).cast("long").as("waiting_time"),
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
      val schedAt = sched
        .join(w, Seq("n_stop"))
        .groupBy("s_stop", "distance", "t_service", "t_route")
        .agg(sort_array(flatten(collect_list(col("deps")))).as("deps"))
      phase("  schedAt.count") { schedAt.count() }
      phase("  schedAt bytes (collect-side est)") {
        val sz = schedAt.select(
          sum(size(col("deps")) * 16 + 64)).collect()(0).getLong(0)
        println(f"    ~${sz / 1e6}%.1f MB"); sz
      }
      val walkSecs = floor(col("distance") / speed).cast("long")
      def change(sa: org.apache.spark.sql.DataFrame) = s
        .join(sa, Seq("s_stop"))
        .filter(col("t_service") === col("s_service") &&
          col("t_route") =!= col("s_route"))
        .withColumn("walking_time", walkSecs)
        .select(col("s_id"), col("s_arr"), col("walking_time"),
          explode(graft.functions.expressions.EarliestAfterExpr(col("deps"),
            col("s_arr") + col("walking_time"))).as("e"))
        .select(col("s_id").as("source"), col("e.t_id").as("target"),
          lit("CHANGE").as("type"),
          (col("e.t_dep") - col("s_arr") + col("walking_time")).cast("long")
            .as("waiting_time"), col("walking_time"))
      val changeEdges = change(schedAt)
      phase("  changeEdges.count (AQE default)") { changeEdges.count() }
      phase("  changeEdges.count (bcast schedAt)") { change(broadcast(schedAt)).count() }
      phase("  union.count (uncached)") { changeEdges.unionByName(precedesDay).count() }
      phase("  union.cache.count") {
        changeEdges.unionByName(precedesDay).cache().count() }
      println("  final AQE plan of the probe join:")
      val df = changeEdges
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Broadcast"))
        .map("    " + _.trim).mkString("\n"))
      nodes.unpersist()
    }
    spark.stop()
  }
}
