package graft

import org.apache.spark.sql.functions._
import graft.ml.IvfAnn

/** IVF index lifecycle: fit-once persistence (the production shape — fitting
  * is an offline build step, queries only probe) and planted-centroid
  * assignment correctness.
  */
class IvfSpec extends SparkSpec {

  private def embeddings = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  }

  test("fitOrLoad fits+persists once; reload and probes run zero k-means fits") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    val table = "ivf_spec_idx"
    val before = IvfAnn.kmeansFits.get()
    val idx1 = IvfAnn.fitOrLoad(spark, embeddings, "embedding", k = 8, table, dir)
    assert(IvfAnn.kmeansFits.get() == before + 1)

    val idx2 = IvfAnn.fitOrLoad(spark, embeddings, "embedding", k = 8, table, dir)
    val q = idx2.assigned.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_v"))
    // two probe calls against the reloaded index — the r3 catalog query
    // refit per invocation; the persisted index must never refit
    assert(IvfAnn.probe(idx2, q, "q_id", "q_v", nprobe = 2).count() == 6)
    assert(IvfAnn.probe(idx2, q, "q_id", "q_v", nprobe = 1).count() == 3)
    assert(IvfAnn.kmeansFits.get() == before + 1, "probe or load refit k-means")

    // centroids survive the parquet round-trip exactly
    assert(idx2.centroids.toSeq.map(_.toSeq) == idx1.centroids.toSeq.map(_.toSeq))
    // the persisted assignment is bucketed by cluster (catalog table knows it)
    assert(spark.catalog.tableExists(table))
    assert(idx2.assigned.count() == embeddings.count())
  }

  test("buildWithCentroids assigns every vector to its nearest planted centroid") {
    val eD = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = eD.filter(col("vec_id") < 8).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val idx = IvfAnn.buildWithCentroids(eD, "vec_id", "v", cents)
    // mirror the probe's exact arithmetic (q·q − 2·q·c + c·c, left-to-right
    // folds) so the driver-side argmin agrees bit-for-bit even on near-ties
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    idx.assigned.select("vec_id", "v", "cluster").collect().take(300).foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val best = cents.zipWithIndex
        .map { case (c, i) => (dotL(v, v) - 2.0 * dotL(v, c) + dotL(c, c), i) }
        .minBy { case (d2, i) => (d2, i) }._2
      assert(r.getInt(2) == best, s"vec ${r.getLong(0)} assigned off-nearest")
    }
    // every vector lands in exactly one cell
    assert(idx.assigned.count() == eD.count())
  }
}
