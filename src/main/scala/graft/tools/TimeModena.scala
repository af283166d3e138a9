package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase timer for the Modena-cardinality harness path. */
object TimeModena {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).repartition(4).count()

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val gtfs = phase("SyntheticGtfs.modena") { graft.etl.SyntheticGtfs.modena(spark) }
    val eng = new graft.api.RoutingEngine(gtfs)
    phase("walkTo") { eng.walkTo.count() }
    val g = phase("projection build+materialize") {
      val g = eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
      g.edges.count(); g
    }
    phase("node cache") { g.nodes.count() }
    phase("sssp CSR") { g.sssp.isLocal }
    phase("stopDim") { g.stopDim.count() }
    val pt = (r: Int, c: Int) => (44.5 + r * 0.0032, 10.8 + c * 0.01)
    val (aLat, aLon) = pt(2, 2); val (bLat, bLon) = pt(6, 2)
    phase("findNearStops x2") {
      eng.findNearStops("2024-01-18", aLat, aLon, 300.0).collect()
      eng.findNearStops("2024-01-18", bLat, bLon, 300.0).collect()
    }
    phase("routing p1") {
      val names1 = eng.findNearStops("2024-01-18", aLat, aLon, 300.0).collect().map(_.getString(0)).toSeq
      val names2 = eng.findNearStops("2024-01-18", bLat, bLon, 300.0).collect().map(_.getString(0)).toSeq
      eng.routingBetweenTwoPoints("2024-01-18", aLat, aLon, bLat, bLon, names1, names2, 1.0, "08:00:00").count()
    }
    spark.stop()
  }
}
