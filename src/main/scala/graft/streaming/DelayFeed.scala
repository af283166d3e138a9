package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.GroupStateTimeout

/** GTFS-RT seam — the vehicle-positions extension SURVEY sketches: a live
  * feed of per-trip delay updates folded into the static time-expanded
  * projection. The reference is strictly batch; this is the engine's
  * real-time story: the delay table is trip-keyed (dimension-sized), so
  * folding it into a 100 TB projection is a broadcast join, and the
  * stateful "latest update wins" fold is bounded by the number of live
  * trips, not the update rate. */
object DelayFeed {

  final case class DelayEvent(trip_id: String, ts: java.sql.Timestamp, delay_secs: Long)
  final case class TripDelay(trip_id: String, delay_secs: Long, as_of: java.sql.Timestamp)

  /** Latest delay per trip from an update stream (stateful upsert
    * changelog, update mode). Ties on timestamp resolve to the larger
    * delay — mirrored exactly by latestDelaysBatch. */
  def latestDelays(updates: Dataset[DelayEvent]): Dataset[TripDelay] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.trip_id)
      .mapGroupsWithState[TripDelay, TripDelay](GroupStateTimeout.NoTimeout) {
        (trip, evs, state) =>
          val candidates = state.getOption.toSeq
            .map(s => (s.as_of.getTime, s.delay_secs)) ++
            evs.map(e => (e.ts.getTime, e.delay_secs))
          val (t, d) = candidates.max
          val td = TripDelay(trip, d, new java.sql.Timestamp(t))
          state.update(td)
          td
      }
  }

  /** Deterministic batch twin of latestDelays. */
  def latestDelaysBatch(updates: DataFrame): DataFrame = {
    val w = Window.partitionBy("trip_id")
      .orderBy(col("ts").desc, col("delay_secs").desc)
    updates.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("trip_id"), col("delay_secs"), col("ts").as("as_of"))
  }

  /** Fold current delays into projection nodes: shift dep/arr by the
    * trip's delay, 0 where no update. Delay table broadcast — trips are a
    * dimension. */
  def applyDelays(nodes: DataFrame, delays: DataFrame): DataFrame =
    nodes.join(broadcast(delays.select(col("trip_id"), col("delay_secs"))),
        Seq("trip_id"), "left")
      .withColumn("dep_secs", col("dep_secs") + coalesce(col("delay_secs"), lit(0L)))
      .withColumn("arr_secs", col("arr_secs") + coalesce(col("delay_secs"), lit(0L)))
      .drop("delay_secs")
}
