package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.EventStreams

/** Streaming-surface demonstrations. The transformations are the exact ones
  * the Structured Streaming layer runs (graft.streaming.EventStreams —
  * StreamingSpec proves stream output == batch output on the same rows);
  * here they execute against the static `events` table so the DuckDB oracle
  * can check them. */
object StreamingQueries {
  import Catalog.t

  def all: Seq[Q] = Seq(

    // Tumbling 1-hour windowed counts + sums with watermark semantics —
    // identical plan shape to the readStream version.
    Q("stream_windowed_counts", "streaming",
      (s, dir) => EventStreams.windowedTypeCounts(
        EventStreams.eventsWithTimestamp(s, dir), "1 hour")
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |       count(*) AS n,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
             |FROM events GROUP BY window_start, event_type
             |ORDER BY window_start, event_type""".stripMargin)),

    // Streaming exact dedup (EventStreams.dedupByKey): bounded-state
    // dropDuplicatesWithinWatermark. The deterministic batch twin keeps
    // the FIRST event per (user, type) — what the stream emits under
    // in-order arrival; StreamingSpec asserts exactly that equivalence.
    // Ranked on the raw NANOS ts long (Catalog.t) — the micros-truncated
    // timestamp could tie where DuckDB's full-nano ordering doesn't.
    Q("stream_dedup_by_key", "streaming,dedup",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        t(s, dir, "events") // ts arrives as long nanos
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |         row_number() OVER (PARTITION BY user_id, event_type
             |                            ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // Upsert/changelog shape (DelayFeed.latestDelays' batch twin): the
    // LATEST row per key. Ordering uses the raw nanosecond ts long so
    // Spark and DuckDB rank identically (micros-truncated timestamps could
    // tie where nanos differ).
    Q("stream_latest_per_key", "streaming",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events") // ts arrives as long nanos (Catalog.t)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),
  )
}
