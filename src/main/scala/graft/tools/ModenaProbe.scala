package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off driver for the Modena-cardinality harness query — prints the
  * projection size and the per-pair measurement table (the same rows the
  * catalog query `gtfs_modena_harness` returns), for local plan/perf
  * iteration without a full Verify/Bench sweep. */
object ModenaProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val eng = new graft.api.RoutingEngine(graft.etl.SyntheticGtfs.modena(spark))
    val g = eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
    println(f"projection: ${g.nodeCount} nodes ${g.edgeCount} edges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val q = graft.queries.Catalog.all.find(_.name == "gtfs_modena_harness").get
    q.run(spark, "unused").show(20, false)
    println(f"harness total: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
