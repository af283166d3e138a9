package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Reachability / connected components — the reference's variable-length
  * path-existence guard (`prova.py:211-212`, SURVEY §2.8 G5) generalized:
  * two vertices can reach each other (undirected) iff they share a
  * component. GraphX's built-in connectedComponents (Pregel under the hood).
  */
object Components {

  /** Connected components over an edge DataFrame (src, dst). Returns
    * (vertex_id, component) where component = min vertex id in the group. */
  def connected(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, 0).connectedComponents()
      .vertices.map { case (vid, comp) => (vid, comp) }
      .toDF("vertex_id", "component")
  }
}
