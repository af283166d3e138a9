package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * AQE's skew-join splitting covers joins; for aggregations over power-law
  * keys (one stop/user/key holding a large share of the rows at 100 TB) a
  * single hash-aggregate partition becomes the straggler. Salting splits
  * each group into `buckets` deterministic sub-groups (salt derived from the
  * row content, not rand() — re-runs produce identical partials), partially
  * aggregates, then combines. Only algebraic aggregates (sum/count/min/max)
  * compose this way.
  */
object Skew {

  /** Salted sum+count: exactly `df.groupBy(keys).agg(sum(valueCol), count)`
    * but with the heavy key spread over `buckets` partial groups. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    val salt = pmod(xxhash64(col(valueCol)), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("count"))
  }
}
