package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: per-step cost of the fixture-scale projection pipeline — the
  * critical path of the gtfs_journey_golden bench query (its transit and
  * footway stacks overlap, so the projection's serial job chain decides the
  * wall time). Each phase forces exactly one lazy layer. */
object TimeProjection {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).repartition(4).count()
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 3) {
      println(s"iter $i")
      val eng = phase("ctor") { graft.api.DemoGtfs.engine(spark) }
      val g = phase("projected (nodes lazy)") {
        eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
      }
      phase("nodes materialize") { g.nodes.count() }
      phase("walkTo materialize") { eng.walkTo.count() }
      phase("edges force (sched+union)") { g.edgeCount }
      phase("csr (count+collect)") { g.sssp.isLocal }
      phase("localIndex collect") {
        g.localIndex.foreach(ix => { ix.byName; ix.stopDim })
      }
      phase("route") {
        eng.routing("2024-01-18", 1.0, "14:00:00", "Alpha", "Epsilon").collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
