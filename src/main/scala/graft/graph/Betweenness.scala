package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Betweenness centrality — the reference's `gds.betweenness.stream` over
  * the projected routing graph (`main.py:46-60`, SURVEY §2.8 G3).
  *
  * Brandes' algorithm on unweighted shortest paths (GDS's default), as a
  * level-synchronous multi-source BFS: one forward sweep accumulating path
  * counts (sigma) per (source, vertex), then a backward sweep over the BFS
  * DAG accumulating dependencies (delta). All sources advance together, so
  * the join count is O(diameter), not O(sources × diameter).
  *
  * Exact when `sources` = all vertices; pass a sample for the standard
  * sampled approximation (scores scale by |V|/|sample|) — the right
  * trade-off at 100 TB scale where exact Brandes is O(V·E).
  */
object Betweenness {

  /** edges: (src: long, dst: long) directed. Returns (vertex_id, score). */
  def run(edges: DataFrame, sources: Seq[Long]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().cache()

    // Forward BFS: visited(s, v, dist, sigma = #shortest s→v paths).
    // Iterative DataFrame loops grow the logical plan exponentially if the
    // lineage isn't cut — localCheckpoint (eager) keeps each level's plan
    // flat (the first uncut run OOM'd building the plan STRING).
    var frontier = sources.distinct.toDF("s")
      .select(col("s"), col("s").as("v"), lit(1.0).as("sigma")).localCheckpoint(true)
    var visited = frontier.withColumn("dist", lit(0)).localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var level = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0) {
      val next = frontier.join(e, frontier("v") === e("src"))
        .select(col("s"), col("dst").as("v"), col("sigma"))
        .join(visited.select("s", "v"), Seq("s", "v"), "left_anti")
        .groupBy("s", "v").agg(sum("sigma").as("sigma"))
        .localCheckpoint(true)
      frontierSize = next.count()
      level += 1
      if (frontierSize > 0) {
        visited = visited.unionByName(next.withColumn("dist", lit(level)))
          .localCheckpoint(true)
        levels += next
      }
      frontier = next
    }

    // Backward sweep: delta(u) += sigma_u/sigma_v · (1 + delta(v)) over DAG
    // edges u→v with dist(v) = dist(u)+1, from the deepest level up.
    val maxLevel = levels.size - 1
    var scores = spark.emptyDataset[(Long, Double)].toDF("vertex_id", "score")
    var deltaNext: DataFrame = null // delta at level `lev` being consumed
    for (lev <- maxLevel to 1 by -1) {
      val vLevel = levels(lev).withColumnRenamed("sigma", "sigma_v")
      val withDelta =
        if (deltaNext == null) vLevel.withColumn("delta", lit(0.0))
        else vLevel.join(deltaNext, Seq("s", "v"), "left")
          .na.fill(0.0, Seq("delta"))
      // score contribution of the vertices at this level (excluding sources,
      // which only appear at level 0)
      scores = scores.unionByName(
        withDelta.groupBy(col("v").as("vertex_id"))
          .agg(sum("delta").as("score")))
      val uLevel = levels(lev - 1).withColumnRenamed("sigma", "sigma_u")
        .withColumnRenamed("v", "u")
      deltaNext = withDelta
        .join(e, withDelta("v") === e("dst"))
        .select(col("s"), col("src").as("u"), col("v"), col("sigma_v"), col("delta"))
        .join(uLevel, Seq("s", "u"))
        .select(col("s"), col("u").as("v"),
          (col("sigma_u") / col("sigma_v") * (col("delta") + 1.0)).as("part"))
        .groupBy("s", "v").agg(sum("part").as("delta"))
        .localCheckpoint(true)
    }
    scores.groupBy("vertex_id").agg(sum("score").as("score"))
  }

  /** Betweenness of the projected routing graph joined back to stop names,
    * ordered by score (the reference's result shape, `main.py:54-58`). */
  def ofProjection(g: graft.projection.TimeExpandedGraph,
      sources: Option[Seq[Long]] = None): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val srcs = sources.getOrElse(g.nodes.select("id").as[Long].collect().toSeq)
    val scores = run(g.edges.select(col("source").as("src"), col("target").as("dst")), srcs)
    g.nodes.join(scores, g.nodes("id") === scores("vertex_id"))
      .select(col("stop_name"), col("dep_secs"), col("lat"), col("lon"), col("score"))
      .orderBy(col("score").desc, col("stop_name"), col("dep_secs"))
  }
}
