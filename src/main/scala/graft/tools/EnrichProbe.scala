package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the enrichment-gate inputs (stopTimes Catalyst stats vs
  * EnrichMinStatBytes) for the Modena synthetic feed, before and after the
  * cache materializes — diagnoses whether the harness build pays the
  * enrichment premium on an inflated unmaterialized estimate. */
object EnrichProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.etl.SyntheticGtfs.modena(spark)
    val st = raw.stopTimes.cache()
    def stats = st.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"unmaterialized cached stats: $stats bytes " +
      s"(floor ${graft.projection.TimeExpandedGraph.EnrichMinStatBytes})")
    val n = st.count()
    println(s"rows: $n, materialized stats: $stats bytes")
    spark.stop()
  }
}
