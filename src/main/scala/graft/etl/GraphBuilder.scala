package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.SpatialFunctions.haversineMeters

/** Derived-edge builders — the reference's create-time graph edges
  * re-expressed as DataFrame computations (SURVEY §2.3 J4/J5).
  */
object GraphBuilder {

  /** PRECEDES: consecutive stoptimes within a trip, weight =
    * next.arrival − this.departure seconds (`new_dbSetup.py:66-74`).
    * The reference's sequence self-join (`s2.stop_sequence = s1.stop_sequence
    * + 1`) becomes a window `lead` over (trip_id, stop_sequence) — one
    * shuffle on trip_id instead of a join. */
  def precedes(stopTimes: DataFrame): DataFrame = {
    val w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    stopTimes
      .withColumn("dst_seq", lead("stop_sequence", 1).over(w))
      .withColumn("dst_arr_secs", lead("arr_secs", 1).over(w))
      .withColumn("dst_stop_id", lead("stop_id", 1).over(w))
      .filter(col("dst_seq").isNotNull)
      .select(col("trip_id"), col("stop_sequence").as("src_seq"), col("dst_seq"),
        col("stop_id").as("src_stop_id"), col("dst_stop_id"),
        (col("dst_arr_secs") - col("dep_secs")).cast("long").as("waiting_time"))
  }

  /** WALK_TO: all ordered stop pairs with geodesic distance < `radius` m —
    * including self-loops (distance 0) and both directions, exactly like the
    * reference's O(n²) MERGE over all pairs (`new_dbSetup.py:94-100`;
    * self-loops are load-bearing — they enable same-stop line changes,
    * SURVEY §7.4).
    *
    * Scale path: instead of a crossJoin, bucket stops into grid cells of
    * ~radius size and equi-join each stop's 3×3 neighborhood — candidates
    * drop from n² to n·k, and the equi-join shuffles on the cell key. */
  def walkTo(stops: DataFrame, radiusMeters: Double = 300.0): DataFrame = {
    // ~1 deg lat = 111.32 km; lon shrinks by cos(lat) — use the worst case
    // across the data (conservative: cos(66°) ≈ 0.4) so cells stay ≥ radius.
    val latCell = radiusMeters / 111320.0
    val lonCell = radiusMeters / (111320.0 * 0.4)
    val cellX = floor(col("stop_lat") / latCell).cast("long")
    val cellY = floor(col("stop_lon") / lonCell).cast("long")
    val a = stops.select(col("stop_id").as("src_stop_id"),
        col("stop_lat").as("src_lat"), col("stop_lon").as("src_lon"),
        cellX.as("cx"), cellY.as("cy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("src_stop_id"), col("src_lat"), col("src_lon"),
        (col("cx") + col("dx")).as("cell_x"), (col("cy") + col("dy")).as("cell_y"))
    val b = stops.select(col("stop_id").as("dst_stop_id"),
      col("stop_lat").as("dst_lat"), col("stop_lon").as("dst_lon"),
      cellX.as("cell_x"), cellY.as("cell_y"))
    a.join(b, Seq("cell_x", "cell_y"))
      .withColumn("distance",
        haversineMeters(col("src_lat"), col("src_lon"), col("dst_lat"), col("dst_lon")))
      .filter(col("distance") < radiusMeters)
      .select("src_stop_id", "dst_stop_id", "distance")
  }
}
