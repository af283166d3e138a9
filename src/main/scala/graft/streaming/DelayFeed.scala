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
  * stateful "latest update wins" fold — with an idle TTL — is bounded by
  * the number of recently-active trips, not the update rate. */
object DelayFeed {

  final case class DelayEvent(trip_id: String, ts: java.sql.Timestamp, delay_secs: Long)
  final case class TripDelay(trip_id: String, delay_secs: Long, as_of: java.sql.Timestamp)

  /** Latest delay per trip from an update stream (stateful upsert
    * changelog, update mode). Ties on timestamp resolve to the larger
    * delay — mirrored exactly by latestDelaysBatch.
    *
    * `idleTtlMs` > 0 evicts a trip's state after that much processing-time
    * inactivity (the final state is re-emitted on expiry, a harmless
    * changelog refresh) — REQUIRED for production feeds, where trip ids are
    * date-qualified and a TTL-less state store grows with every service day
    * ever seen. 0 keeps state forever (deterministic tests). */
  def latestDelays(updates: Dataset[DelayEvent], idleTtlMs: Long = 0L): Dataset[TripDelay] = {
    import updates.sparkSession.implicits._
    val timeoutConf =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates.groupByKey(_.trip_id)
      .mapGroupsWithState[TripDelay, TripDelay](timeoutConf) {
        (trip, evs, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val candidates = state.getOption.toSeq
              .map(s => (s.as_of.getTime, s.delay_secs)) ++
              evs.map(e => (e.ts.getTime, e.delay_secs))
            val (t, d) = candidates.max
            val td = TripDelay(trip, d, new java.sql.Timestamp(t))
            state.update(td)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            td
          }
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
