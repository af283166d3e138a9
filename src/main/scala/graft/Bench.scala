package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Emits a full JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},
  *  "runs":{name:[sec,...]},"starts":{name:[epochSec,...]},"sf":dir}
  * followed by a compact FINAL line sized for a consumer that keeps only the
  * last 2000 chars of stdout (see `qmsLine`).
  *
  * Each query runs `BENCH_REPEATS` times (default 2) and `queries` reports the
  * MIN across runs: a co-tenant CPU spike during one window poisons a single
  * run, not the reported number. `starts` carries the wall-clock epoch seconds
  * of every run so a contended window is identifiable post-hoc from the JSON
  * alone (a contiguous block of inflated first-runs with normal second-runs is
  * the contention signature; BENCH_r03 was unreadable without this).
  */
object Bench {

  /** JSON string-literal escaping for interpolated values (sfDir is a
    * filesystem path — a backslash or quote in it must not break the line). */
  private[graft] def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** The tail-window-safe summary: total seconds plus per-query INTEGER
    * MILLISECONDS in a name-sorted array (`v(i)` belongs to the i-th
    * element of `SparkEntry.queries.keys.toSeq.sorted` — a consumer must
    * sort the names itself; Map iteration order is unspecified).
    * Integer ms and no names keep the line ~600 chars for 86 queries
    * (r3-r5's name-keyed line was 2877 chars and was cut mid-line by the
    * consumer's 2000-char tail window every round — BenchReportSpec pins
    * the budget so it can't regress). `n` must equal the full catalog size
    * for the positional mapping to hold: a SPARK_GRAFT_BENCH_ONLY subset
    * run (local iteration only; driver runs leave it unset) shifts the
    * array, and n != catalog size is the consumer's detection signal.
    */
  def qmsLine(totalSec: Double, sfDir: String, minsSecNameSorted: Seq[Double]): String = {
    val ms = minsSecNameSorted.map(s => math.round(s * 1000)).mkString("[", ",", "]")
    val tot = math.round(totalSec * 1000) / 1000.0
    s"""{"metric":"qms","value":$tot,"unit":"sec","sf":${jsonStr(sfDir)},"n":${minsSecNameSorted.size},"v":$ms}"""
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/shuffle machinery so the first measured query doesn't
    // absorb session start-up (~5 s otherwise) — including the parquet
    // reader path against the actual data dir (region is ~5 rows), so the
    // alphabetically-first real query isn't charged for footer/codec init.
    spark.range(1000).repartition(4).groupBy((org.apache.spark.sql.functions
      .col("id") % 10).as("k")).count().collect()
    try spark.read.parquet(s"$sfDir/region.parquet").repartition(2)
      .groupBy("r_name").count().collect()
    catch { case _: Throwable => () }
    // Optional subset run for iterating on one query's timing:
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 (driver runs always leave this unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      def runOnce(): (Double, Double) = {
        val start = System.currentTimeMillis() / 1000.0
        val t0 = System.nanoTime()
        // noop sink: forces full evaluation of every column (count() would let
        // Catalyst prune the plan down to a row count).
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        // Queries may cache intermediates internally; drop them so one run's
        // cached blocks neither speed up the next run nor pressure its memory.
        spark.catalog.clearCache()
        (start, dt)
      }
      val base = (1 to repeats).map(_ => runOnce())
      // Sub-2 s queries get a third run: their reported min is otherwise one
      // co-tenant CPU spike away from a 2-4× phantom regression (the r7
      // adjudication), and an extra short run costs almost nothing.
      val timings =
        if (base.map(_._2).min < 2.0) base :+ runOnce() else base
      (name, timings.map(_._2), timings.map(_._1))
    }
    def obj(pairs: Seq[(String, String)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map { case (k, runs, _) => k -> runs.min.toString })
    val runsJson = obj(results.map { case (k, runs, _) =>
      k -> runs.mkString("[", ",", "]") })
    val startsJson = obj(results.map { case (k, _, starts) =>
      k -> starts.mkString("[", ",", "]") })
    val total = results.map(_._2.min).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"starts":$startsJson,"sf":${jsonStr(sfDir)}}""")
    // The driver keeps only the TAIL of stdout: the full line above is 4k+
    // chars and gets cut mid-line ("parsed": null in r3-r5). Final line =
    // the compact name-free summary, guaranteed (BenchReportSpec) to fit a
    // 2000-char tail window together with the truncated remains of the
    // full line, so the last complete line always parses with every number.
    println(qmsLine(total, sfDir, results.map(_._2.min)))
    spark.stop()
  }
}
