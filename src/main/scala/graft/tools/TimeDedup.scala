package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only stage timer for the md5 dedup pipeline at a given sf dir. */
object TimeDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
    println("docs: " + docsRaw.count())

    val docs = docsRaw.select(col("doc_id"), md5Shingles(col("text"), 2).as("sh")).cache()
    phase("md5Shingles materialize") { docs.count() }
    phase("avg shingles/doc") {
      println("    " + docs.select(avg(size(col("sh")))).head().getDouble(0))
    }
    val sig = docs.select(col("doc_id"), minhashMd5(col("sh"), 16).as("sg"))
    phase("minhash sigs") { sig.write.format("noop").mode("overwrite").save() }
    val banded = docs
      .select(col("doc_id"), explode(lshBandKeysMd5(minhashMd5(col("sh"), 16), 8, 2)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    phase("banded materialize") { banded.write.format("noop").mode("overwrite").save() }
    val candidates = banded.select(col("band"), col("key"), col("doc_id").as("a_id"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("b_id")), Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    phase("candidates") { println("    n=" + candidates.count()) }
    val dim = docs.select(col("doc_id"), md5Prefix60(col("sh")).as("s6"))
    val verified = candidates
      .join(dim.select(col("doc_id").as("a_id"), col("s6").as("a_sh")), Seq("a_id"))
      .join(dim.select(col("doc_id").as("b_id"), col("s6").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), jaccardSorted(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    phase("verify") { println("    n=" + verified.count()) }
    spark.stop()
  }
}
