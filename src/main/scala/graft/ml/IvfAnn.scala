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

  /** K-means fits performed this JVM — lets specs prove the fit-once path
    * (a probe against a persisted index must not refit; the earlier
    * catalog query refit per invocation and the fit dominated its time). */
  private[graft] val kmeansFits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Cluster the embeddings (array<float/double> column) into k cells. */
  def build(embeddings: DataFrame, vecCol: String, k: Int, seed: Long = 42L): Index = {
    kmeansFits.incrementAndGet()
    val feats = embeddings.withColumn("__features", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__features").fit(feats)
    val assigned = model.transform(feats)
      .withColumnRenamed(model.getPredictionCol, "cluster")
      .drop("__features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Build an index around GIVEN cell centers (no Lloyd iterations): each
    * vector goes to its nearest centroid via the same expanded-L2 ranking
    * the probe uses. Two uses: deterministic planted-centroid indexes whose
    * assignment a SQL oracle can re-derive exactly, and re-assignment of
    * fresh data into an existing (persisted) index without refitting. */
  def buildWithCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): Index =
    Index(probe(Index(null, centroids), embeddings, idCol, vecCol, nprobe = 1),
      centroids)

  /** Persist the index: centroids as a k-row parquet, the assignment
    * bucketed by cluster id (saveAsTable — bucketing needs a catalog
    * entry; `path` makes it external). A probe then equi-joins `assigned`
    * on `cluster` with NO shuffle of the corpus side, and at 100 TB a
    * probe reads only the `nprobe` matching buckets. */
  def save(index: Index, tableName: String, path: String, buckets: Int = 16): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite").option("path", s"$path/assigned")
      .bucketBy(buckets, "cluster").sortBy("cluster").saveAsTable(tableName)
  }

  /** Re-open a persisted index: k-row centroid read + the bucketed table
    * scan — zero k-means work. */
  def load(spark: SparkSession, tableName: String, path: String): Index = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cluster", "centroid").orderBy("cluster")
      .collect().map(_.getSeq[Double](1).toArray)
    Index(spark.table(tableName), cents)
  }

  /** Fit-once entry point: fit + persist on first call, reload thereafter —
    * the production shape (the fit is an offline build step; queries only
    * ever probe). */
  def fitOrLoad(spark: SparkSession, embeddings: => DataFrame, vecCol: String,
      k: Int, tableName: String, path: String, seed: Long = 42L): Index =
    if (spark.catalog.tableExists(tableName)) load(spark, tableName, path)
    else {
      save(build(embeddings, vecCol, k, seed), tableName, path)
      load(spark, tableName, path)
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
