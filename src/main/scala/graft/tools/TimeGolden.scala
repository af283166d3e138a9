package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase timer for the gtfs_routing_golden bench path (judge noted
  * a 2.06 s → 4.83 s swing between rounds; this splits the cost). */
object TimeGolden {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).repartition(4).count()

    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.api.DemoGtfs.engine(spark)
        .routing("2024-01-18", 1.0, "14:00:00", "Alpha", "Epsilon")
        .write.format("noop").mode("overwrite").save()
      println(f"bench-shape iteration $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
