package graft.queries

import graft.streaming.EventStreams

/** Streaming-surface demonstrations. The transformations are the exact ones
  * the Structured Streaming layer runs (graft.streaming.EventStreams —
  * StreamingSpec proves stream output == batch output on the same rows);
  * here they execute against the static `events` table so the DuckDB oracle
  * can check them. */
object StreamingQueries {

  def all: Seq[Q] = Seq(

    // Tumbling 1-hour windowed counts + sums with watermark semantics —
    // identical plan shape to the readStream version.
    Q("stream_windowed_counts", "streaming",
      (s, dir) => EventStreams.windowedTypeCounts(
        EventStreams.eventsWithTimestamp(s, dir), "1 hour")
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |       count(*) AS n,
             |       sum(CAST(round(value * 100) AS BIGINT)) AS total_value_cents
             |FROM events GROUP BY window_start, event_type
             |ORDER BY window_start, event_type""".stripMargin)),
  )
}
