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
}
