package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Emits a full JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},
  *  "runs":{name:[sec,...]},"starts":{name:[epochSec,...]},"sf":dir}
  * followed by a compact FINAL line sized for a consumer that keeps only the
  * last 2000 chars of stdout (see `qmsLine`).
  *
  * Each query runs `BENCH_REPEATS`+1 times (default 2+1 = 3) and `queries`
  * reports the MIN across runs: a co-tenant CPU spike during one window
  * poisons a single run, not the reported number. `starts` carries the
  * wall-clock epoch seconds of every run so a contended window is
  * identifiable post-hoc from the JSON alone, and the final qms line carries
  * per-query spread percent (see `qmsLine`) so even a tail-truncated log
  * flags contention mechanically.
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
    * Integer ms and no names keep the line well under budget for 89
    * queries (r3-r5's name-keyed line was 2877 chars and was cut mid-line
    * by the consumer's 2000-char tail window every round — BenchReportSpec
    * pins the budget so it can't regress). `n` must equal the full catalog
    * size for the positional mapping to hold: a SPARK_GRAFT_BENCH_ONLY
    * subset run (local iteration only; driver runs leave it unset) shifts
    * the array, and n != catalog size is the consumer's detection signal.
    *
    * `spr(i)` is the matching per-query CONTENTION SIGNAL: integer percent
    * spread across that query's repeats, (max−min)/min × 100, capped at
    * 999. Idle-box repeats of an unchanged query sit within ~0-40%; a
    * co-tenant load inflates some runs 2-4× (spread 100-300+) — so a round
    * whose spr values are broadly large was measured under contention and
    * its v(i) minima are upper bounds, not steady-state numbers (the r8
    * adjudication re-ran half the catalog idle to establish exactly this).
    */
  def qmsLine(totalSec: Double, sfDir: String, minsSecNameSorted: Seq[Double],
      spreadPctNameSorted: Seq[Int] = Nil): String = {
    val ms = minsSecNameSorted.map(s => math.round(s * 1000)).mkString("[", ",", "]")
    val spr = spreadPctNameSorted.map(p => math.min(999, math.max(0, p)))
      .mkString("[", ",", "]")
    val tot = math.round(totalSec * 1000) / 1000.0
    s"""{"metric":"qms","value":$tot,"unit":"sec","sf":${jsonStr(sfDir)},"n":${minsSecNameSorted.size},"spr":$spr,"v":$ms}"""
  }
  def main(args: Array[String]): Unit = {
    // Timing runs skip the perf-harness's cross-regime verification twin:
    // the twin is correctness machinery (it re-routes every pair through
    // the OTHER SSSP regime, ~4.5 s per pair of fixture-scale TransitSssp
    // iteration scheduling), runs on every Verify/correctness pass where
    // it belongs, and would otherwise dominate the harness's bench row
    // (~1 s of measured work vs ~9 s of verification) — the same
    // bench-totals-stay-clean rule that made the Modena harness twin
    // opt-in (GraphQueries).
    sys.props("graft.perfharness.twin") = "0"
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
        // clearCache frees the BLOCKS but builder-retained cache handles
        // would still accumulate plan references across a 96-query run —
        // drain the registry too (review r16)
        graft.queries.Pipeline.releaseRetainedCaches()
        (start, dt)
      }
      val base = (1 to repeats).map(_ => runOnce())
      // Every query gets a third run (r8: sub-2 s only). min-of-2 is one
      // co-tenant CPU spike away from a 2-4× phantom regression, and r8's
      // SUSTAINED contention defeated even min-of-3 on the slow queries —
      // the extra repeat plus the qms line's per-query spread signal lets a
      // consumer adjudicate contended rounds from the JSON alone. NOTE for
      // cross-round comparison: run counts changed r7→r8→r9 (2 → 3-for-fast
      // → 3-for-all); minima bias slightly down as repeats rise, so the
      // "runs" object carries the actual per-query run count.
      val timings = base :+ runOnce()
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
    println(qmsLine(total, sfDir, results.map(_._2.min),
      results.map { case (_, runs, _) =>
        val mn = runs.min
        if (mn <= 0.0) 0 else math.round((runs.max - mn) / mn * 100).toInt
      }))
    spark.stop()
  }
}
