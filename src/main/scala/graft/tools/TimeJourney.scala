package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase timer for the gtfs_journey_golden bench path — splits the
  * composed journey's cost into projection, routing, and footway phases. */
object TimeJourney {
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
      println(f"  $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    for (i <- 1 to 3) {
      println(s"iteration $i")
      val eng = phase("engine ctor") { graft.api.DemoGtfs.engine(spark) }
      val fw = phase("footway ctor") { graft.api.DemoGtfs.footwayEngine(spark) }
      val g = phase("projection+index") {
        val g = eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
        g.sssp.isLocal; g.localIndex.foreach(ix => { ix.byName; ix.stopDim }); g
      }
      val names = phase("findNearStops x2") {
        (eng.findNearStops("2024-01-18", 44.5998, 10.9000, 300.0).collect(),
          eng.findNearStops("2024-01-18", 44.6400, 10.9200, 300.0).collect())
      }
      phase("routingBetweenTwoPoints") {
        eng.routingBetweenTwoPoints("2024-01-18", 44.5998, 10.9000, 44.6400,
          10.9200, names._1.map(_.getString(0)).toSeq,
          names._2.map(_.getString(0)).toSeq, 1.0, "14:00:00").collect()
      }
      phase("footway warm (nearest+sssp)") { fw.nearestFootNode(44.5998, 10.9000) }
      phase("distancesFromStops") {
        fw.distancesFromStops(Seq(("SA", 44.5998, 10.9000), ("SE", 44.6400, 10.9200)))
      }
      phase("full journey()") {
        eng.journey("2024-01-18", 44.5998, 10.9000, 44.6400, 10.9200,
          speed = 1.0, time = "14:00:00", footway = Some(fw)).get
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
