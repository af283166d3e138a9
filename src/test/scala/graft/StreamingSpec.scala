package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("windowed counts: streaming output equals the batch plan on same rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:45:00"), "click", 2.0),
      (3L, ts("2024-01-01 11:10:00"), "buy", 10.0),
      (4L, ts("2024-01-01 11:20:00"), "click", 3.0))
    val batch = EventStreams.windowedTypeCounts(
      rows.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("window_start", "event_type")
      .collect().toSeq

    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = EventStreams.windowedTypeCounts(
      mem.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.map(_.getAs[Long]("n")).sum == 4)
    } finally q.stop()
  }

  test("streaming dedup keeps the first row per key under in-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = EventStreams.dedupByKey(
      mem.toDF().toDF("user_id", "ts", "event_type", "value"), "user_id")
      .writeStream.format("memory").queryName("dedup_keys")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
        (1L, ts("2024-01-01 10:05:00"), "click", 2.0), // dup key, later ts
        (2L, ts("2024-01-01 10:01:00"), "buy", 5.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:10:00"), "click", 3.0)) // still dup
      mem.addData((3L, ts("2024-01-01 10:11:00"), "click", 4.0)) // new key
      q.processAllAvailable()
      val out = spark.table("dedup_keys")
        .select("user_id", "value").as[(Long, Double)].collect().toMap
      // exactly one row per key, and it is the FIRST-arrived one
      assert(out == Map(1L -> 1.0, 2L -> 5.0, 3L -> 4.0))
    } finally q.stop()
  }

  test("sessionize: per-user state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.SessionEvent]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      mem.addData(
        EventStreams.SessionEvent(7L, ts("2024-01-01 10:00:00"), 5.0),
        EventStreams.SessionEvent(7L, ts("2024-01-01 10:00:30"), 2.0),
        EventStreams.SessionEvent(9L, ts("2024-01-01 10:00:10"), 1.0))
      q.processAllAvailable()
      mem.addData(EventStreams.SessionEvent(7L, ts("2024-01-01 10:01:00"), 3.0))
      q.processAllAvailable()
      val out = spark.table("sessions").as[EventStreams.UserSession]
        .collect().groupBy(_.user_id)
      // user 7's latest state: 3 events, 10.0 total
      val u7 = out(7L).maxBy(_.n_events)
      assert(u7.n_events == 3 && u7.total_value == 10.0)
      assert(out(9L).head.n_events == 1)
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join on same rows") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val rows = Seq((1L, 10L), (2L, 11L), (3L, 12L), (1L, 13L)) // user 3: no dim row
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.enrich(mem.toDF().toDF("user_id", "event_id"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("enriched")
        .select("user_id", "event_id", "tier")
        .as[(Long, Long, String)].collect().toSet
      val batch = EventStreams.enrich(rows.toDF("user_id", "event_id"), dim, "user_id")
        .select("user_id", "event_id", "tier")
        .as[(Long, Long, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 10L, "gold"), (2L, 11L, "silver"), (1L, 13L, "gold")))
    } finally q.stop()
  }

  test("flatMapGroups gap sessionization equals the native session_window") {
    // the arbitrary-state batch fold (sessionizeBatchUs) and the
    // declarative session_window aggregation must produce identical
    // sessions on the same rows — including the boundary convention
    // (an event at exactly last + gap MERGES: touching windows coalesce)
    // and the [first, last + gap) span
    val rows = Seq(
      (1L, 1000000L, 1.0), (1L, 1500000L, 2.0),   // same session (0.5 s gap)
      (1L, 1500000L + 2000000L, 4.0),             // exactly gap later → merges
      (2L, 5000000L, 8.0))                        // single-event session
    val df = rows.toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val native = EventStreams.sessionWindows(df, "2 seconds", "0 seconds")
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"),
        col("total_value_cents"))
      .orderBy("user_id", "s").collect().toSeq
    val custom = EventStreams.sessionizeBatchUs(
        df.select(col("user_id"), unix_micros(col("ts")), col("value"))
          .as[(Long, Long, Double)], 2000000L)
      .toDF().select(col("user_id"), col("session_start_us").as("s"),
        col("session_end_us").as("e"), col("n_events"), col("total_value_cents"))
      .orderBy("user_id", "s").collect().toSeq
    assert(custom == native)
    assert(custom.length == 2) // user 1: one 3-event session; user 2: one
  }

  test("two events exactly 30 minutes apart form ONE session (both forms)") {
    // The catalog oracles (stream_sessionize / stream_sessionize_custom)
    // open a new session only on `us - lag(us) > 1800000000`: an event at
    // exactly last + gap must MERGE. This pins that convention at the
    // production gap for both the native session_window aggregation and
    // the arbitrary-state fold — a `>=` oracle would split here and
    // hash-mismatch.
    val df = Seq((7L, 0L, 1.0), (7L, 1800000000L, 2.0)) // exactly 30 min apart
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val native = EventStreams.sessionWindows(df, "30 minutes", "0 seconds")
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect().toSeq
    val custom = EventStreams.sessionizeBatchUs(
        df.select(col("user_id"), unix_micros(col("ts")), col("value"))
          .as[(Long, Long, Double)], 1800000000L)
      .toDF().select(col("user_id"), col("session_start_us").as("s"),
        col("session_end_us").as("e"), col("n_events"))
      .collect().toSeq
    assert(native == custom)
    assert(native.length == 1 && native.head.getLong(3) == 2L)
    assert(native.head.getLong(2) == 1800000000L + 1800000000L) // [0, last+gap)
  }

  test("stream-stream interval join equals the batch join on same rows") {
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 11:00:00")),
      (2L, 12L, ts("2024-01-01 10:30:00")))
    val clicks = Seq(
      (1L, 20L, ts("2024-01-01 10:04:00")), // within 10 min of view 10
      (1L, 21L, ts("2024-01-01 10:20:00")), // outside view 10's window
      (1L, 22L, ts("2024-01-01 11:05:00")), // within view 11's window
      (2L, 23L, ts("2024-01-01 10:31:00")), // within view 12's window
      (3L, 24L, ts("2024-01-01 10:00:00"))) // no view for user 3
    def df(rows: Seq[(Long, Long, java.sql.Timestamp)]) =
      rows.toDF("user_id", "event_id", "ts")
    val batch = EventStreams.intervalJoinByUser(df(views), df(clicks), "10 minutes")
      .select("user_id", "l_id", "r_id").orderBy("user_id", "l_id", "r_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(batch == Seq((1L, 10L, 20L), (1L, 11L, 22L), (2L, 12L, 23L)))

    val memV = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.intervalJoinByUser(
      memV.toDF().toDF("user_id", "event_id", "ts"),
      memC.toDF().toDF("user_id", "event_id", "ts"), "10 minutes")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      memV.addData(views: _*)
      memC.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("interval_join")
        .select("user_id", "l_id", "r_id").orderBy("user_id", "l_id", "r_id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("batch events table flows through the same windowed plan") {
    val df = EventStreams.eventsWithTimestamp(spark, "/root/testdata/sf0.001")
    val out = EventStreams.windowedTypeCounts(df, "1 day")
    assert(out.count() > 0)
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total == 1000) // all events land in some window
  }
}
