package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph CSV export/import (SURVEY §2.1 S4/S5) — the reference
  * migrates the footway graph between databases with
  * `apoc.export.csv.all` + `LOAD CSV` + `MERGE … ON CREATE SET`
  * (PDF p.5-6 §2.1-2.3). Per-table CSV round-trip with upsert merge.
  */
object GraphCsv {

  /** Export one table per directory, CSV with headers (apoc.export.csv.all
    * analog — Spark writes a directory of part files; `single` coalesces for
    * small graphs / interop with single-file readers). */
  def exportTable(df: DataFrame, dir: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(dir)
  }

  def importTable(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)

  /** MERGE-on-key upsert semantics (`MERGE … ON CREATE SET`, PDF p.5):
    * existing rows win; incoming rows are added only for unseen keys
    * (incoming deduped on the key first — LOAD CSV can carry repeats). */
  def mergeOnKeys(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val fresh = incoming
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
    existing.unionByName(fresh)
  }

  /** Null-guarded edge import (`WHERE row._start IS NOT NULL`,
    * `prova.py:212`-era loader; P9): drop rows missing either endpoint. */
  def importEdges(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      srcCol: String, dstCol: String): DataFrame =
    importTable(spark, dir, schema)
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
}
