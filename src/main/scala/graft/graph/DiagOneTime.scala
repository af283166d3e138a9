package graft.graph // package-scoped: times TransitSssp's private pins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: decomposes the one-time costs that dominate a large-scale
  * capped route (r12 verdict #2: of the 411 s 100× capped route, ~234 s
  * is one-time — change-slice pin ~114 s + round-0 capped-grid
  * construction ~120 s, both undiagnosed). Builds the synthetic grid at
  * SPARK_GRAFT_DIAG_DIM (default 500 = the 100× point), forces each pin
  * separately, then materializes round 0's grid in cumulative fragments:
  *   A  scan+cap-filter+crossJoin+checkpoint   (no window, no joins)
  *   B  A + the ride window                    (adds the 4×grid sort)
  *   C  B + the candidate join/merge/observe   (= the real round 0)
  * The A→B→C deltas attribute the cost to write vs sort vs join/plan.
  * Run: SPARK_DRIVER_MEM=48g tools/run_tool.sh graft.graph.DiagOneTime */
object DiagOneTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).repartition(4).count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = sys.env.getOrElse("SPARK_GRAFT_DIAG_DIM", "500").toInt
    val raw = graft.etl.SyntheticGtfs.grid(spark, n, n, 25,
      baseSecs = 5 * 3600, headwaySecs = 2300, hopSecs = 90, directions = 2,
      rowStepDeg = 0.0032)
    val g = raw.copy(stopTimes = raw.stopTimes.cache(), stops = raw.stops.cache())
    g.stopTimes.count(); g.stops.count()
    val eng = new graft.api.RoutingEngine(g)
    val proj = timed("projection build (edges.count)") {
      val p = eng.projected(java.sql.Date.valueOf("2024-01-18"), 1.0)
      p.edges.count(); p
    }
    val transit = new TransitSssp(
      proj.nodes, proj.changeEnriched) // the production construction
    val bridge = org.apache.spark.sql.graftbridge.CheckpointBridge

    timed("trip-prefix pin (prepared.count)") { transit.prepared.count() }
    // r15 (verdict #5): the pin's row count rides the checkpoint write as
    // an Observation — forcing the pin IS the count, one job
    timed("change-slice pin (+observed count)") {
      transit.change
      println(s"[diag] change pin rows (observed): ${transit.changeRowCount}")
    }

    // Same cap a production "08:00 + 4 h horizon" route would use.
    val clockCap = 12 * 3600.0
    val gridBase = transit.prepared.filter(col("dep_secs") <= clockCap)
    val nBase = timed("gridBase count (capped prefix)") { gridBase.count() }
    println(s"[diag] capped prefix rows: $nBase")

    // Four sources — the shape of a real routing call's seed set.
    val srcs = proj.nodes
      .filter(col("stop_name") === "Stop 0/0" && col("dep_secs") > 8 * 3600)
      .orderBy("dep_secs").limit(4).select("id")
      .collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    val srcDim = srcs.sorted.toDF("src")

    def state0: DataFrame = gridBase.crossJoin(broadcast(srcDim))
      .withColumn("dist", when(col("id") === col("src"), -col("acum")))
      .withColumn("fresh", col("dist").isNotNull)
      .select("src", "trip_id", "stop_sequence", "dist", "fresh")

    val a = timed("A crossJoin + ckpt") { TransitSssp.ckpt(state0) }
    println(s"[diag] grid rows: ${a.count()}")
    bridge.unpersistCheckpoint(a)

    val b = timed("B crossJoin + window + ckpt") {
      TransitSssp.ckpt(state0.withColumn("rdist", transit.rideCol)
        .select(col("src"), col("trip_id"), col("stop_sequence"),
          col("rdist").as("dist"), col("fresh")))
    }
    bridge.unpersistCheckpoint(b)

    val c = timed("C full round 0 (convergeCounted 1 it)") {
      // maxIterations=1 runs exactly round 0 then throws (no convergence)
      // — catch and discard; the timing is what we came for.
      try { transit.convergeCounted(srcs.toSet, 1, clockCap = clockCap); () }
      catch { case _: IllegalStateException => () }
    }

    // Rerun C to split first-run JIT/planning from steady state.
    timed("C' full round 0, second run") {
      try { transit.convergeCounted(srcs.toSet, 1, clockCap = clockCap); () }
      catch { case _: IllegalStateException => () }
    }
    eng.close()
    spark.stop()
  }
}
