package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-demonstration query: a Spark pipeline over the
  * testdata tables in `sfDir`, plus (where SQL-expressible) an equivalent
  * DuckDB oracle statement the driver hash-compares against.
  *
  * Every query output has a deterministic total order and every computed
  * column is aliased identically on both sides (the driver sorts columns by
  * name and hashes values).
  */
final case class Q(
    name: String,
    surveyRef: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  def all: Seq[Q] =
    Relational.all ++ Pipeline.all ++ GraphQueries.all ++ StreamingQueries.all

  /** Floor below which [[t]] skips the scan-spread repartition: dimension
    * tables (region, nation, supplier, part, customer at bench scale) are
    * broadcast-join fodder — fanning them out buys nothing and costs an
    * Exchange. Statistics here are parquet FILE bytes. */
  private[graft] val SpreadMinStatBytes: Long = 512L << 10

  /** Read one testdata table, normalizing `events.ts` to LONG
    * nanoseconds-since-epoch whatever the parquet's physical type is —
    * the generator has shipped it both as TIMESTAMP(NANOS) (no native
    * Spark type; `nanosAsLong` reads it as the long directly) and as
    * TIMESTAMP(MICROS) (arrives as timestamp/timestamp_ntz; converted
    * here, exact ×1000). Queries do exact integer time math on the nanos
    * long; DuckDB reads the same file natively and the oracles use its
    * timestamp functions, so both sides always see the same instants
    * (session timezone is pinned UTC in every entrypoint, so the
    * NTZ-wall-time-as-UTC read matches DuckDB's naive epoch_us). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // SCAN SPREAD (r20, guide §2.5 "input skew: one huge unsplittable
    // file … repartition immediately after the read"): the testdata
    // tables are single-row-group single files, so every scan — and the
    // whole narrow chain above it (shingling, regex, JSON parse, partial
    // aggregation) — otherwise runs as ONE task regardless of core count.
    // Repartition to the session's parallelism when the scan would
    // produce fewer partitions than cores (bytes < cores ×
    // maxPartitionBytes — at warehouse scale that predicate is false and
    // this is a no-op, so nothing here is tuned to local mode), skipping
    // sub-[[SpreadMinStatBytes]] dimension tables. Round-robin, so no
    // key skew; results are unchanged (every catalog query has a total
    // ORDER BY, and the sampling rows select by row-content hash, not by
    // position). Parquet stats here are exact file bytes.
    val n = spark.sparkContext.defaultParallelism
    val bytes = raw.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val df =
      if (bytes >= BigInt(SpreadMinStatBytes) && bytes < maxPart * n)
        raw.repartition(n)
      else raw
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
}
