package graft

/** Pins the bench self-report's tail-window contract: the consumer of the
  * bench stdout keeps only the LAST 2000 characters, so the final printed
  * line — `Bench.qmsLine` — must fit that window together with the cut-off
  * remains of the preceding full-detail line, for the real catalog size and
  * worst-case timing magnitudes. r3-r5 shipped summary lines of 2877+ chars
  * and the consumer parsed null three rounds running; this spec makes that
  * class of regression a test failure instead. Also pins the r17 drift
  * controls: fixed row counts (a control whose plan drifts is no longer
  * comparable to its pinned band) and the drift arithmetic.
  */
class BenchReportSpec extends SparkSpec {

  private val names = queries.Catalog.all.map(_.name).sorted
  // Worst-case magnitudes: every query at 100+ seconds (6-digit ms) with
  // the spread signal saturated at its 999 cap.
  private val slow = names.map(_ => 123.456789)
  private val spreads = names.map(_ => 999)

  test("qms line fits the 2000-char tail window with headroom") {
    val line = Bench.qmsLine(slow.sum, "/root/testdata/sf0.1", slow, spreads,
      drift = Seq(9.99, 9.99), fixtureSec = 99999.999)
    // 1350 ≈ worst case at 99 queries incl. the r18 degraded stamp and the
    // r19 adj/fx fields; leaves ~650 chars of the 2000-char window for the
    // cut-off detail-line tail
    assert(line.length < 1350,
      s"qms line is ${line.length} chars for ${names.size} queries — " +
        "must stay well under the consumer's 2000-char tail window")
  }

  test("qms line is the last complete line of a tail -c 2000 cut") {
    val full = "{\"metric\":\"total\"," + "x" * 8000 + "}" // stand-in for the detail line
    val out = full + "\n" + Bench.qmsLine(slow.sum, "/root/testdata/sf0.1", slow, spreads,
      drift = Seq(9.99, 9.99)) + "\n"
    val tail = out.takeRight(2000)
    val lastComplete = tail.split("\n").filter(_.nonEmpty).last
    assert(lastComplete.startsWith("{\"metric\":\"qms\""))
    assert(lastComplete.endsWith("]}"))
    // one integer-ms entry per catalog query, recoverable by sorted name
    val v = lastComplete.split("\"v\":\\[")(1).stripSuffix("]}").split(",")
    assert(v.length == names.size)
    assert(v.forall(_.matches("-?\\d+")))
  }

  test("qms values are integer milliseconds in name-sorted order") {
    val line = Bench.qmsLine(0.3, "sf", Seq(0.1, 0.2), Seq(5, 1400))
    assert(line.contains("\"n\":2"))
    assert(line.contains("\"v\":[100,200]"))
    assert(line.contains("\"value\":0.3"))
    // spread percent is capped at 999 so a pathological run can't blow the
    // line budget
    assert(line.contains("\"spr\":[5,999]"))
    // no controls ran (subset run) → drift explicitly empty, not absent
    assert(line.contains("\"drift\":[]"))
  }

  test("qms drift indices round to 2 dp (r17 self-adjudication)") {
    val line = Bench.qmsLine(0.3, "sf", Seq(0.1), Seq(0),
      drift = Seq(1.3333333, 0.98765))
    assert(line.contains("\"drift\":[1.33,0.99]"))
  }

  test("control pins are positive and the median is exact") {
    assert(Bench.Controls.nonEmpty && Bench.Controls.size >= 3)
    assert(Bench.Controls.forall(_._2 > 0.0), "every control needs a pinned band")
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("io control round-trips its fixed parquet deterministically") {
    Bench.IoControl._3(spark) // must not throw; writes+reads the tmp parquet
    val df = spark.read.parquet("/tmp/graft_ctl_io.parquet")
    assert(df.count() == 2000000L)
    assert(Bench.IoControl._2 > 0.0, "io control needs a pinned band")
  }

  test("drift gate trips on any index, never on an empty subset run (r18)") {
    // The retry/degraded decision: BENCH_r17 shipped at ioPre 2.88 with
    // cpuPre 1.51 — either alone must trip the gate; a clean close
    // ([1.26,1.14] pre) must not; a controls-skipped subset run (empty
    // indices) must never trip it.
    assert(Bench.DriftRetryGate == 1.5, "gate is pinned — re-pin only with a verdict")
    assert(Bench.exceedsGate(Seq(1.51, 1.0)))      // cpu alone (r17 artifact)
    assert(Bench.exceedsGate(Seq(1.03, 2.88)))     // io alone (r17 artifact)
    assert(!Bench.exceedsGate(Seq(1.26, 1.14)))    // the clean close
    assert(!Bench.exceedsGate(Seq(1.5, 1.5)))      // gate is exclusive
    assert(!Bench.exceedsGate(Nil))                // subset run: no controls
    assert(Bench.driftSettleSec > 0)
  }

  test("qms line carries the drift-normalized total and fixture split (r19)") {
    // adj = value / max(1, median(drift)): inflation-only normalization —
    // a clean or fast box passes the total through unchanged; a drifted
    // capture publishes the hand-derived reading in-band.
    assert(Bench.driftAdjusted(80.0, Seq(2.0, 1.0, 2.0, 3.0)) == 40.0)
    // the r18 clean capture's indices: median 0.94 < 1 → identity
    assert(Bench.driftAdjusted(73.0, Seq(1.05, 0.86, 1.02, 0.73)) == 73.0)
    // a genuinely inflated capture normalizes by the median
    assert(math.abs(Bench.driftAdjusted(84.0, Seq(1.2, 1.1, 1.4, 1.0)) -
      84.0 / 1.15) < 1e-9)
    assert(Bench.driftAdjusted(73.0, Seq(0.9, 0.8)) == 73.0) // fast box: identity
    assert(Bench.driftAdjusted(73.0, Nil) == 73.0)           // subset run
    val line = Bench.qmsLine(10.0, "sf", Seq(4.0, 6.0), Seq(0, 0),
      drift = Seq(2.0, 2.0), fixtureSec = 6.0)
    assert(line.contains("\"adj\":5.0"))
    assert(line.contains("\"fx\":6.0"))
    // the forced-fixture rows are pinned by name: a rename must come back
    // here (and to the COVERAGE headline-split note), not silently rejoin
    // the min-of-3 pool
    assert(Bench.FixtureRows ==
      Set("gtfs_routing_distributed", "gtfs_routing_zero_cycle"))
  }

  test("qms line carries the degraded stamp (r18 capture loop)") {
    val bad = Bench.qmsLine(0.3, "sf", Seq(0.1), Seq(0),
      drift = Seq(2.0, 1.1, 2.9, 0.9), degraded = true)
    assert(bad.contains("\"degraded\":true"))
    val ok = Bench.qmsLine(0.3, "sf", Seq(0.1), Seq(0), drift = Seq(1.1, 1.0))
    assert(ok.contains("\"degraded\":false"))
  }

  test("control pipelines evaluate with their fixed cardinalities") {
    // A control that stops producing its pinned shape (plan change, ANSI
    // overflow, column rename) must fail HERE, not silently time different
    // work than the band was pinned on.
    val counts = Bench.Controls.map { case (n, _, fn) => n -> fn(spark).count() }.toMap
    assert(counts("ctl_hash_agg") == 1000L ||
      counts("ctl_hash_agg") == 1999L, // xxhash64 % 1000 spans -999..999
      s"ctl_hash_agg groups: ${counts("ctl_hash_agg")}")
    assert(counts("ctl_sort") == 8000000L)
    assert(counts("ctl_string") == 4000000L ||
      counts("ctl_string") < 4000000L && counts("ctl_string") > 3000000L,
      s"ctl_string groups: ${counts("ctl_string")}")
  }
}
