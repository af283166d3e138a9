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

    // Gap-based sessionization (EventStreams.sessionWindows batch twin):
    // native session_window aggregation — per-user sessions split on MORE
    // THAN 30 min of inactivity (an event at exactly last + gap MERGES:
    // touching windows coalesce, in both session_window — probed empirically,
    // StreamingSpec's boundary cases — and sessionizeBatchUs's `> gapUs`),
    // session span = [first_ts, last_ts + gap). The oracle
    // re-derives the same sessions relationally (lag → new-session flag →
    // running sum) on the micros timeline both engines share; money as
    // exact integer cents. mapGroupsWithState sessionize (arbitrary-state
    // form) keeps its StreamingSpec parity coverage.
    Q("stream_sessionize", "streaming",
      (s, dir) => EventStreams.sessionWindows(
        EventStreams.eventsWithTimestamp(s, dir), "30 minutes")
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
             |f AS (
             |  SELECT user_id, event_id, us, value,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, us, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id,
             |  make_timestamp(min(us)) AS session_start,
             |  make_timestamp(max(us) + 1800000000) AS session_end,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // The ARBITRARY-STATE sessionization path under the hash gate: the
    // same per-user gap fold the mapGroupsWithState operator runs,
    // executed via groupByKey + flatMapGroups on the static table (r4
    // noted the custom-state form was spec-only). Same session semantics
    // as stream_sessionize, so the same relational oracle pins it.
    Q("stream_sessionize_custom", "streaming",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .selectExpr("CAST(user_id AS BIGINT)", "CAST(ts div 1000 AS BIGINT)",
            "CAST(value AS DOUBLE)")
          .as[(Long, Long, Double)]
        EventStreams.sessionizeBatchUs(e, 1800000000L).toDF()
          .select(col("user_id"),
            timestamp_micros(col("session_start_us")).as("session_start"),
            timestamp_micros(col("session_end_us")).as("session_end"),
            col("n_events"), col("total_value_cents"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
             |f AS (
             |  SELECT user_id, event_id, us, value,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, us, value,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id,
             |  make_timestamp(min(us)) AS session_start,
             |  make_timestamp(max(us) + 1800000000) AS session_end,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Stream-static enrichment (EventStreams.enrich batch twin): events
    // joined to the broadcast customer dimension — the most common
    // streaming pattern (no state; the dim rebroadcasts per micro-batch).
    Q("stream_static_enrich", "streaming,J2",
      (s, dir) => {
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        EventStreams.enrich(
            t(s, dir, "events").select("event_id", "user_id", "event_type"),
            dim, "user_id")
          .select("event_id", "user_id", "event_type", "c_mktsegment")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, c_mktsegment
             |FROM events JOIN customer ON user_id = c_custkey
             |ORDER BY event_id""".stripMargin)),

    // Stream-stream interval join (EventStreams.intervalJoinByUser batch
    // twin): view → same-user click within 24 h, the attribution shape
    // whose streaming form bounds join state via two-sided watermarks.
    // Joined on MICROSECONDS (ts div 1000 == DuckDB's epoch_us of the
    // nanos-truncated timestamp) so both engines compare identical longs.
    Q("stream_interval_join", "streaming,join",
      (s, dir) => {
        val e = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("us").as("view_us"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
        v.join(c, Seq("user_id"))
          .filter(col("click_us") >= col("view_us") &&
            col("click_us") <= col("view_us") + lit(86400000000L))
          .select(col("user_id"), col("view_id"), col("click_id"),
            expr("(click_us - view_us) div 1000").as("lag_ms"))
          .orderBy("user_id", "view_id", "click_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
             |v AS (SELECT user_id, event_id AS view_id, us AS view_us FROM e
             |      WHERE event_type = 'view'),
             |c AS (SELECT user_id, event_id AS click_id, us AS click_us FROM e
             |      WHERE event_type = 'click')
             |SELECT v.user_id AS user_id, view_id, click_id,
             |       (click_us - view_us) // 1000 AS lag_ms
             |FROM v JOIN c ON v.user_id = c.user_id
             |WHERE click_us >= view_us AND click_us <= view_us + 86400000000
             |ORDER BY v.user_id, view_id, click_id""".stripMargin)),
  )
}
