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

  /** Below this edge count, run classic Brandes on the collected edge list
    * (the same adaptive trick as ShortestPaths: the reference's "distributed"
    * engine is single-node in-memory anyway, and the level-synchronous
    * DataFrame loop costs ~25 scheduler round-trips that a 16-node demo
    * graph doesn't deserve). */
  val LocalBrandesMaxEdges: Long = 200000L

  /** edges: (src: long, dst: long) directed. Returns (vertex_id, score). */
  def run(edges: DataFrame, sources: Seq[Long],
      localThreshold: Long = LocalBrandesMaxEdges): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().cache()
    if (e.count() <= localThreshold) {
      val scores = runLocal(e.as[(Long, Long)].collect(), sources)
      e.unpersist()
      return scores.toSeq.toDF("vertex_id", "score")
    }

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

  /** Classic single-machine Brandes (unweighted BFS variant) — identical
    * semantics to the distributed path; also serves as its test oracle. */
  def runLocal(edges: Array[(Long, Long)], sources: Seq[Long]): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val score = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    sources.distinct.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1.0).withDefaultValue(0.0)
      val preds = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
      val order = scala.collection.mutable.ArrayBuffer.empty[Long]
      val queue = scala.collection.mutable.Queue(s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        order += v
        adj.getOrElse(v, Array.empty).foreach { u =>
          if (!dist.contains(u)) { dist(u) = dist(v) + 1; queue.enqueue(u) }
          if (dist(u) == dist(v) + 1) { sigma(u) += sigma(v); preds(u) = v :: preds(u) }
        }
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      order.reverseIterator.foreach { w =>
        preds(w).foreach { v => delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w)) }
        if (w != s) score(w) += delta(w)
      }
    }
    score.toMap
  }

  /** Above this vertex count the default switches from exact Brandes
    * (O(V·E) — dead at Modena's 249k nodes, let alone 100×) to the standard
    * sampled approximation: `DefaultSampleSources` pivots picked by a
    * deterministic hash order, scores scaled by |V|/|sample|. */
  val ExactSourcesMaxVertices: Long = 5000L
  val DefaultSampleSources: Int = 256

  /** Betweenness of the projected routing graph joined back to stop names,
    * ordered by score (the reference's result shape, `main.py:54-58`).
    *
    * Default source policy: exact below `ExactSourcesMaxVertices` vertices,
    * sampled above (never an all-vertex collect on a big graph — the pivot
    * set reaches the driver via a TakeOrdered of `DefaultSampleSources`
    * ids, O(sample) not O(V)). */
  def ofProjection(g: graft.projection.TimeExpandedGraph,
      sources: Option[Seq[Long]] = None, seed: Long = 42L): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (srcs, scale) = sources match {
      case Some(s) => (s, 1.0)
      case None =>
        val nVerts = g.nodeCount
        if (nVerts <= ExactSourcesMaxVertices)
          (g.nodes.select("id").as[Long].collect().toSeq, 1.0)
        else {
          val sample = g.nodes.select(col("id"))
            .orderBy(xxhash64(col("id"), lit(seed)))
            .limit(DefaultSampleSources).as[Long].collect().toSeq
          (sample, nVerts.toDouble / sample.size)
        }
    }
    val scores = run(g.edges.select(col("source").as("src"), col("target").as("dst")), srcs)
    g.nodes.join(scores, g.nodes("id") === scores("vertex_id"))
      .select(col("stop_name"), col("dep_secs"), col("lat"), col("lon"),
        (col("score") * scale).as("score"))
      .orderBy(col("score").desc, col("stop_name"), col("dep_secs"))
  }
}
