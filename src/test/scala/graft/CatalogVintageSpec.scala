package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog
import graft.streaming.EventStreams

/** The driver regenerates the testdata between rounds and has shipped
  * `events.ts` under different physical parquet types — TIMESTAMP(NANOS)
  * (arrives as a long under nanosAsLong) through r8, TIMESTAMP(MICROS)
  * (arrives as timestamp_ntz) from r9. Catalog.t promises the SAME
  * long-nanos `ts` to every query, and EventStreams.eventsWithTimestamp
  * the same TimestampType, whatever vintage is on disk. This spec writes
  * one tiny events file per vintage and pins the normalized values
  * equal, so the next silent regeneration fails here instead of as 14
  * analysis errors in the round's correctness file. */
class CatalogVintageSpec extends SparkSpec {
  import spark.implicits._

  // micro-aligned instants (the micros vintage can't carry sub-micro
  // precision, so parity across vintages is only defined on them)
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1704067199999999L)

  private def writeVintage(dir: java.nio.file.Path, shape: String): String = {
    val out = s"$dir/$shape/events.parquet"
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, "purchase") }
      .toDF("event_id", "us", "event_type")
    val df = shape match {
      // NOTE: this vintage is APPROXIMATED by a pre-decoded INT64 column —
      // Spark cannot WRITE physical parquet TIMESTAMP(NANOS), so the file
      // carries the long values the nanosAsLong read path would produce,
      // not a true NANOS column. It pins Catalog.t's handling of a
      // long-typed ts; a Spark upgrade breaking the nanosAsLong decode
      // itself would not fail here (no real r8-era NANOS fixture exists
      // in-repo to pin that).
      case "long_nanos" => base.select(col("event_id"),
        (col("us") * 1000L).as("ts"), col("event_type"))
      case "timestamp" => base.select(col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
      case "timestamp_ntz" => base.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("event_type"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(out)
    s"$dir/$shape"
  }

  test("Catalog.t yields identical long-nanos ts for every vintage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vintage")
    try {
      val perVintage = Seq("long_nanos", "timestamp", "timestamp_ntz").map { shape =>
        val d = writeVintage(dir, shape)
        val got = Catalog.t(spark, d, "events")
        assert(got.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType, s"vintage $shape")
        shape -> got.orderBy("event_id").select("ts").as[Long].collect().toSeq
      }
      val expected = micros.map(_ * 1000L)
      perVintage.foreach { case (shape, vals) =>
        assert(vals == expected, s"vintage $shape")
      }
    } finally graft.etl.GtfsWarehouse.deleteRecursively(dir)
  }

  test("eventsWithTimestamp yields identical TimestampType ts for every vintage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vintage_ts")
    try {
      val perVintage = Seq("long_nanos", "timestamp", "timestamp_ntz").map { shape =>
        val d = writeVintage(dir, shape)
        val got = EventStreams.eventsWithTimestamp(spark, d)
        assert(got.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType, s"vintage $shape")
        shape -> got.orderBy("event_id")
          .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      }
      perVintage.foreach { case (shape, vals) =>
        assert(vals == micros, s"vintage $shape")
      }
    } finally graft.etl.GtfsWarehouse.deleteRecursively(dir)
  }
}
