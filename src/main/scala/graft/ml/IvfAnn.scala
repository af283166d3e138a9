package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.VectorFunctions.{cosine, dot, unitVector}
import graft.functions.expressions.DotProductExpr

/** IVF (inverted-file) approximate nearest neighbor — the clustered scale
  * path for similarity search, alongside the sign-LSH variant:
  * partition the corpus with k-means (Spark ML, seeded → deterministic),
  * then answer queries by probing only the `nprobe` nearest clusters and
  * re-ranking exactly. At 100 TB the assigned table is written bucketed by
  * cluster id, so a probe reads `nprobe/k` of the data.
  */
object IvfAnn {

  final case class Index(assigned: DataFrame, centroids: Array[Array[Double]])

  /** Cluster the embeddings (array<float/double> column) into k cells. */
  def build(embeddings: DataFrame, vecCol: String, k: Int, seed: Long = 42L): Index = {
    val feats = embeddings.withColumn("__features", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__features").fit(feats)
    val assigned = model.transform(feats)
      .withColumnRenamed(model.getPredictionCol, "cluster")
      .drop("__features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Probe-cell assignment for a query *table*: one row per (query,
    * probe-cell), equi-joinable against `assigned` on `cluster` — the scale
    * path for a large query set (the per-vector `probeClusters` loop builds
    * one plan per query and caps at a handful). The centroid table is k rows,
    * broadcast; squared L2 is expanded as q·q − 2·q·c + c·c so the whole
    * ranking stays in codegen'd expressions. */
  def probe(index: Index, queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val centDF = {
      import spark.implicits._
      index.centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "__cent")
    }
    val w = Window.partitionBy(idCol).orderBy(col("__d2"), col("cluster"))
    queries.crossJoin(broadcast(centDF))
      .withColumn("__d2",
        dot(col(vecCol), col(vecCol)) - lit(2.0) * dot(col(vecCol), col("__cent"))
          + dot(col("__cent"), col("__cent")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .drop("__d2", "__rn", "__cent")
  }

  /** Nearest `nprobe` cluster ids for one query vector (driver-side: the
    * centroid table is k rows). */
  def probeClusters(index: Index, query: Array[Double], nprobe: Int): Seq[Int] =
    index.centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, i)
      }
      .sortBy(_._1).take(nprobe).map(_._2).toSeq
}
