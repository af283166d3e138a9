package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the Join/Exchange skeleton of the Modena-cardinality
  * projection edge plan, with WALK_TO materialized first (the r20 harness
  * shape) — verifies the measured-stats broadcast gates fire. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.etl.SyntheticGtfs.modena(spark)
    val cached = raw.copy(stopTimes = raw.stopTimes.cache(), stops = raw.stops.cache())
    val eng = new graft.api.RoutingEngine(cached)
    val pre = if (args.contains("nowarm")) -1L else eng.walkTo.count()
    println(s"walkTo rows: $pre, stats after: " +
      eng.walkTo.queryExecution.optimizedPlan.stats.sizeInBytes)
    val g = eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
    val plan = g.edges.queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange"))
      .map(_.trim.take(120)).mkString("\n"))
    spark.stop()
  }
}
