package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Weighted shortest paths on GraphX Pregel.
  *
  * Re-expresses the reference's `gds.shortestPath.dijkstra.stream`
  * (`main.py:95-101,143-151`) and `apoc.algo.dijkstra` (`prova.py:208-226`)
  * as distributed edge relaxation. Key design decision (SURVEY §7.3): the
  * reference runs ONE Dijkstra per candidate (source, target) pair — a
  * correlated-procedure anti-pattern. We decorrelate: one multi-source
  * Pregel run carries `Map[sourceId -> (dist, pred)]`, so N candidate
  * sources cost one traversal instead of N.
  *
  * The projected routing graph is time-expanded (edges only go forward in
  * time), i.e. a DAG — relaxation converges in ≤ longest-path supersteps.
  */
object ShortestPaths {

  /** Per-vertex routing state: for each reachable source, best known
    * (distance, predecessor vertex). */
  type State = Map[VertexId, (Double, VertexId)]

  private def mergeStates(a: State, b: State): State =
    if (a.isEmpty) b else if (b.isEmpty) a
    else (a.keySet ++ b.keySet).iterator.map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => if (x._1 <= y._1) x else y
        case (Some(x), None) => x
        case (None, Some(y)) => y
        case (None, None) => throw new IllegalStateException
      })
    }.toMap

  /** Multi-source SSSP. Returns a VertexRDD whose state maps each source to
    * the best (distance, predecessor) at that vertex. */
  def multiSource(edges: RDD[Edge[Double]], sources: Set[VertexId],
      maxIterations: Int = Int.MaxValue): VertexRDD[State] = {
    val g: Graph[State, Double] = Graph.fromEdges(edges, Map.empty: State)
    val init = g.mapVertices { (vid, _) =>
      if (sources.contains(vid)) Map(vid -> (0.0, -1L)) else Map.empty[VertexId, (Double, VertexId)]
    }
    val result = Pregel(init, Map.empty: State, maxIterations, EdgeDirection.Out)(
      vprog = (_, state, msg) => mergeStates(state, msg),
      sendMsg = triplet => {
        val improvements: State = triplet.srcAttr.iterator.flatMap {
          case (src, (dSrc, _)) =>
            val cand = dSrc + triplet.attr
            triplet.dstAttr.get(src) match {
              case Some((dCur, _)) if dCur <= cand => None
              case _ => Some(src -> (cand, triplet.srcId))
            }
        }.toMap
        if (improvements.nonEmpty) Iterator((triplet.dstId, improvements)) else Iterator.empty
      },
      mergeMsg = mergeStates)
    result.vertices
  }

  /** Single-source convenience wrapper. */
  def singleSource(edges: RDD[Edge[Double]], source: VertexId): VertexRDD[State] =
    multiSource(edges, Set(source))

  /** Distances as a DataFrame (vertex_id, source_id, dist). */
  def distancesDF(spark: SparkSession, vertices: VertexRDD[State]): DataFrame = {
    import spark.implicits._
    vertices.flatMap { case (vid, st) =>
      st.iterator.map { case (src, (d, pred)) => (vid, src, d, pred) }
    }.toDF("vertex_id", "source_id", "dist", "pred")
  }

  /** Reconstruct the best path source→target by walking predecessors.
    * Collects only the (vertex, pred) chain entries for the chosen source —
    * tiny relative to the graph (path-length rows), fine on the driver.
    * Returns vertex ids source-first, or Nil if unreachable. */
  def pathTo(vertices: VertexRDD[State], source: VertexId, target: VertexId): List[VertexId] = {
    val chain: Map[VertexId, VertexId] = vertices
      .flatMap { case (vid, st) => st.get(source).map { case (_, pred) => (vid, pred) } }
      .collect().toMap
    if (!chain.contains(target)) return Nil
    @annotation.tailrec
    def walk(v: VertexId, acc: List[VertexId]): List[VertexId] =
      if (v == source) v :: acc
      else chain.get(v) match {
        case Some(p) if p != -1L => walk(p, v :: acc)
        case _ => v :: acc
      }
    walk(target, Nil)
  }

  /** Edge-count threshold below which SSSP runs as a driver-local Dijkstra
    * over the collected edge list instead of Pregel. This is the honest
    * analog of the reference's GDS execution — its "distributed" graph is a
    * single-node in-memory CSR — and it saves ~10 Pregel supersteps of
    * scheduler overhead (seconds) on subgraph-scale inputs. Above the
    * threshold (e.g. the full Modena projection, 738k edges ≈ still local;
    * a 100 TB-scale projection is not) Pregel takes over. */
  val LocalDijkstraMaxEdges: Long = 200000L

  /** SSSP over an edge DataFrame (src: long, dst: long, weight: double),
    * returning (vertex_id, source_id, dist, pred). Adaptively picks local
    * Dijkstra vs distributed Pregel by edge count; results are identical
    * (both exact). `localThreshold = 0` forces Pregel. */
  def fromDF(edges: DataFrame, sources: Set[Long],
      localThreshold: Long = LocalDijkstraMaxEdges): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double"))
    val n = e.count()
    if (n <= localThreshold) localDijkstraDF(spark, e, sources)
    else {
      val edgeRdd = e.rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
      distancesDF(spark, multiSource(edgeRdd, sources))
    }
  }

  /** Driver-local multi-source Dijkstra (binary-heap) over a collected edge
    * list — same output contract as the Pregel path. */
  private def localDijkstraDF(spark: SparkSession, edges: DataFrame,
      sources: Set[Long]): DataFrame = {
    import spark.implicits._
    val adj = edges.as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    val out = Seq.newBuilder[(Long, Long, Double, Long)]
    sources.toSeq.sorted.foreach { src =>
      val dist = scala.collection.mutable.Map(src -> 0.0)
      val pred = scala.collection.mutable.Map(src -> -1L)
      val pq = scala.collection.mutable.PriorityQueue((0.0, src))(Ordering.by(-_._1))
      while (pq.nonEmpty) {
        val (d, v) = pq.dequeue()
        if (d <= dist.getOrElse(v, Double.PositiveInfinity)) {
          adj.getOrElse(v, Array.empty).foreach { case (u, w) =>
            if (d + w < dist.getOrElse(u, Double.PositiveInfinity)) {
              dist(u) = d + w
              pred(u) = v
              pq.enqueue((d + w, u))
            }
          }
        }
      }
      dist.foreach { case (v, d) => out += ((v, src, d, pred(v))) }
    }
    out.result().toDF("vertex_id", "source_id", "dist", "pred")
  }
}
