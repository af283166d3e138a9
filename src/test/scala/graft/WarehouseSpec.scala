package graft

import org.apache.spark.sql.functions._
import graft.etl.{GtfsLoader, GtfsWarehouse}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned warehouse prunes to one partition per day") {
    val gtfs = GtfsLoader.load(spark, fixtureDir)
    val dir = java.nio.file.Files.createTempDirectory("warehouse").toString
    GtfsWarehouse.write(gtfs, dir)

    val d1 = GtfsWarehouse.loadDay(spark, dir, java.sql.Date.valueOf("2024-01-18"))
    assert(d1.count() == 16) // all 16 stoptimes valid on the day
    // partition pruning: the rows actually read come only from the
    // day=2024-01-18 directory (input_file_name() is the runtime truth —
    // DataFrame.inputFiles lists the whole relation pre-pruning), and the
    // physical plan carries the day partition filter.
    val files = d1.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(_.contains("day=2024-01-18")), files.mkString("\n"))
    assert(d1.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // a day with no service reads nothing
    val d0 = GtfsWarehouse.loadDay(spark, dir, java.sql.Date.valueOf("2024-02-02"))
    assert(d0.count() == 0)

    // expansion count = stoptimes × valid days of their service (S1: 2 days)
    val all = spark.read.parquet(s"$dir/day_stoptimes")
    assert(all.count() == 32)
  }

  test("stop-bucketed warehouse joins co-locate without a shuffle") {
    val gtfs = GtfsLoader.load(spark, fixtureDir)
    val dir = java.nio.file.Files.createTempDirectory("warehouse-bucketed").toString
    GtfsWarehouse.writeBucketedByStop(gtfs, "day_stoptimes_by_stop", s"$dir/t", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy must choose sort-merge —
      // the bucketed layout then satisfies the join's distribution with
      // ZERO Exchange operators on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("day_stoptimes_by_stop")
      val joined = t.alias("a").join(t.alias("b"), "stop_id")
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS day_stoptimes_by_stop")
    }
  }
}
