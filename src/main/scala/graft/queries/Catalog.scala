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

  /** Read one testdata table. `events.ts` is TIMESTAMP(NANOS), which Spark
    * has no native type for — read it as long nanoseconds-since-epoch
    * (queries do exact integer time math on it; DuckDB sees timestamp_ns). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
