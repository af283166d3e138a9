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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
}
