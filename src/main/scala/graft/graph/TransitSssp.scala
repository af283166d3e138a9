package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed SSSP specialized to the TIME-EXPANDED transit graph — the
  * production (>2M-edge) routing regime.
  *
  * Generic Pregel relaxes one edge hop per superstep, so its round count is
  * the graph's longest relaxation chain — and a time-expanded day is DEEP:
  * riding a trip end to end is one PRECEDES hop per stoptime, giving ~600+
  * supersteps at 3× Modena (measured >10 min per routing call at local[32];
  * each superstep is a full graph shuffle). But the depth is almost all
  * WITHIN-TRIP: a trip's PRECEDES chain v→…→u has cost A(u) − A(v) for a
  * per-trip cumulative prefix A (hop weights arr_next − dep_cur, dwells
  * included), so one window prefix-min per iteration relaxes EVERY ride of
  * every trip at once:
  *
  *   dist_ride(u) = min(dist(u), min over earlier trip rows v of
  *                      (dist(v) − A(v)) + A(u))
  *
  * followed by one equi-join through the CHANGE edges. An iteration is
  * therefore ride* ∘ change, and the iteration count is bounded by the
  * maximum number of LINE CHANGES on any optimal path (single digits for
  * transit) instead of the hop depth. The state is the checkpointed
  * (source × stoptime) grid; BOTH per-round operations are expressed
  * against its hash(trip_id)-compatible, (src, trip_id, stop_sequence)-
  * sorted layout: the prefix-min window and the candidate merge (keyed
  * on the target's primary key, carried on the pinned CHANGE slice)
  * group and join on grid-layout keys, so only the frontier-sized
  * candidate table does real data movement per round. NOTE on layout
  * metadata: under AQE, localCheckpoint drops the partitioning/ordering
  * info, so the grid's per-round Exchange/Sort is re-planned each round
  * — re-attaching the metadata via CheckpointBridge.rePin was built,
  * measured (~neutral wall on local[32]) and REVERTED for the
  * loop-carried grid after routing-parity failures showed layout-claim
  * induction through join/window flavors is unsound under AQE (r11
  * bisect, COVERAGE.md); only the static trip-prefix and CHANGE-slice
  * pins (terminal repartition/sort, faithful by construction) remain.
  * This is the standard round-based structure transit engines
  * (RAPTOR-family) exploit, re-expressed as Catalyst window + join so
  * it scales with the cluster.
  *
  * STATE REPRESENTATION (round 11): the grid stores distances in
  * RELATIVE ("rel") space — rel(u) = dist(u) − A(u), the quantity the
  * ride prefix-min already operated on — and carries only
  * (src, trip_id, stop_sequence, dist, fresh): five fixed-width fields
  * ≈ 48 B/UnsafeRow against the previous seven ≈ 64 B. The round loop
  * rewrites the full grid every iteration, so row width IS the block
  * churn that drove the 10×-Modena GC variance (VERDICT r10 #2):
  *  - `acum` is gone from the state: in rel space the ride closure is a
  *    pure prefix-min (rel'(u) = min(rel(u), min over earlier v of
  *    rel(v))), and the CHANGE candidate weight pre-folds both
  *    endpoints' prefixes into one static per-edge constant
  *    w_rel = A(src) + w − A(dst), carried on the pinned slice. All
  *    values stay integer-valued doubles, so fixpoint equalities remain
  *    exact; absolute distances are restored (dist = rel + A) by one
  *    position join against the pinned trip prefix at OUTPUT time only
  *    (Staged.distances / resolveState), never per round.
  *  - `id` is gone from the state: every in-loop join is positional on
  *    (trip_id, stop_sequence) — the node's primary key — and the CHANGE
  *    slice carries both endpoints' positions. Ids rejoin the output in
  *    the same position join that restores A.
  *  - the CHANGE slice is pinned REPARTITIONED on hash(s_trip) and
  *    sorted (s_trip, s_seq), so the per-round frontier→edge join is
  *    Exchange-free on BOTH sides (grid and slice are co-partitioned on
  *    the trip key; only the frontier-sized sort runs) — previously the
  *    slice sat on its build-join partitioning and re-shuffled or
  *    re-sorted every mid-flood round.
  *
  * Exactness: label-correcting Bellman-Ford over the (ride-closure, change)
  * operator — monotone improvements to a unique fixpoint = Dijkstra's
  * distances (weights ≥ 0). All weights are integer-valued doubles, so the
  * fixpoint equality tests in the predecessor pass are exact. Predecessors
  * are resolved AFTER convergence in one pass (stale mid-iteration preds
  * can dangle): a vertex's pred is any in-edge satisfying
  * dist(u) = dist(v) + w(v,u) at the fixpoint — for ride-optimal vertices
  * the immediate trip predecessor satisfies it (telescoping), for
  * change-optimal vertices the CHANGE source does; ties resolve
  * deterministically (seeds first, then smallest pred id). The output
  * contract matches ShortestPaths.distancesDF: (vertex_id, source_id,
  * dist, pred), pred = -1 at sources, only reached vertices present —
  * ShortestPaths.pathDistributed walks it unchanged. GtfsEngineSpec's
  * forced-distributed parity test pins itineraries equal to the CSR
  * branch; TransitSsspSpec pins distances equal to generic Pregel.
  */
object TransitSssp {
  /** Session-unique run counter for observation names (see run()). */
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** SPARK_GRAFT_SSSP_TRACE=1 prints one line per iteration (round index,
    * improved-row count, wall seconds) plus the one-time pin cost — dev
    * diagnostics for decomposing a routing call's cost; off by default. */
  private val trace: Boolean = sys.env.get("SPARK_GRAFT_SSSP_TRACE").contains("1")

  /** Grid checkpoints are stored SERIALIZED (MEMORY_AND_DISK_SER) by
    * default — a measured decision: the ~600 MB/round deserialized grids
    * drove GC spikes that inflated individual 10×-Modena rounds up to 8×
    * (12-54 s rounds amid 5 s neighbors; worst pair 190.6 s). Two
    * serialized runs measured max spike ~2.5× (rounds ≤ 21 s) and the two
    * best pairs recorded (67.7, 72.5 s) — spike magnitude capped, though
    * pair-level variance from box scheduling remains (COVERAGE.md
    * distributed section carries both runs). The deserialization CPU on
    * the 2-3 grid scans per round is noise next to that; at 3× the levels
    * measure equivalent. SPARK_GRAFT_SSSP_SER=0 opts back into the
    * deserialized level; a test may flip the var directly (both storage
    * paths are spec-pinned for distance parity). */
  @volatile private[graft] var serializedGrid: Boolean =
    !sys.env.get("SPARK_GRAFT_SSSP_SER").contains("0")

  /** The sparse-tail BASE looks like the opposite storage trade from the
    * round churn that justified the serialized default above: written ONCE
    * at tail entry, then fully SCANNED 2×/round for the rest of the run
    * (slice pull + candidate-target probe) — a long tail (the 30× grid
    * center dribbles ~17 rounds) re-pays the decode dozens of times.
    * Measured at exactly that worst case (back-to-back 30× center-pair
    * runs, COVERAGE.md tail section): NO repeatable win — tail sums
    * 216 s serialized vs 206 s deserialized vs 248 s with pins also
    * deserialized, all inside the per-round GC/scheduler spike band. The
    * tail round's floor is scheduling/planning-bound (3 broadcasts + 3
    * AQE jobs per round), not decode-bound, so the default stays OFF
    * (follow the grid level); SPARK_GRAFT_SSSP_TAIL_DESER=1 re-runs the
    * A/B. */
  @volatile private[graft] var deserializedTailBase: Boolean =
    sys.env.get("SPARK_GRAFT_SSSP_TAIL_DESER").contains("1")

  /** Same scan-many/write-once profile for the STATIC pins (trip prefix +
    * CHANGE slice): pinned once per projection, streamed in full on every
    * round of every routing call. SPARK_GRAFT_SSSP_PIN_DESER=1 stores them
    * deserialized for A/B against the serialized default — measured at the
    * 30× center pair: 458 s vs the 462 s all-serialized baseline, i.e. no
    * repeatable delta (COVERAGE.md tail section); default stays
    * serialized. */
  @volatile private[graft] var deserializedPins: Boolean =
    sys.env.get("SPARK_GRAFT_SSSP_PIN_DESER").contains("1")

  /** Max ride∘change depths batched per materialized sparse-tail round
    * (see sparseTail): each materialized round pays the O(grid) slice
    * pull + fixed scheduling floor ONCE and then iterates the operator up
    * to this many times over slice-sized frames. The r11 verdict measured
    * the un-batched tail at ~216 s of a 30× center pair (~17 rounds ×
    * O(grid) × scheduling floor) and ≈600 s of the 100× probe — round
    * count and per-round base touch are exactly what batching divides.
    * SPARK_GRAFT_SSSP_TAIL_K overrides (1 = the r11 un-batched shape,
    * kept reachable for A/B). */
  @volatile private[graft] var tailK: Int =
    sys.env.get("SPARK_GRAFT_SSSP_TAIL_K").map(_.toInt).getOrElse(8)

  /** Tail batching only engages when the frozen base has at least this
    * many rows: below it a tail round is already sub-second and the
    * expansion machinery (one checkpoint job per hop) would cost more
    * than the base touches it saves — fixture-scale runs and the
    * per-round oracle keep the exact r11 un-batched loop. Specs lower it
    * to 0 to force the batched path onto fixture graphs. */
  @volatile private[graft] var tailBatchMinBase: Long =
    sys.env.get("SPARK_GRAFT_SSSP_TAIL_MINBASE").map(_.toLong)
      .getOrElse(1L << 20)

  /** Checkpoint at the PIN storage level (static frames). */
  private[graph] def ckptPin(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointBridge.flattenStats(
      if (serializedGrid && !deserializedPins) df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      else df.localCheckpoint(true))

  /** Eager local checkpoint at the configured grid storage level. The
    * result is rewrapped WITHOUT origin statistics
    * (CheckpointBridge.flattenStats): each round's plan joins the grid
    * with grid-derived candidates, so the size-only estimator's exponent
    * DOUBLES per checkpointed round — at 30× Modena (flood + long sparse
    * tail ≈ 32 rounds) the BigInt stats products first dominate driver
    * time (measured 41 → 165 → 895 s "rounds" that were pure planning)
    * and then overflow BigInteger inside Dataset.localCheckpoint's stats
    * rewrite. Flattening keeps every round's estimate depth-bounded;
    * in-loop join shapes are hint- or partitioning-driven (broadcast()
    * on the sparse frontier, pinned SMJ elsewhere) and AQE re-plans from
    * actual sizes, so no plan choice regresses. */
  private[graph] def ckpt(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointBridge.flattenStats(
      if (serializedGrid) df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      else df.localCheckpoint(true))
  private def tlog(msg: => String): Unit = if (trace) println(s"[transit-sssp] $msg")

  /** One-shot convenience over [[TransitSssp]] — for repeated calls against
    * one projection hold an instance (the per-projection Sssp handle does),
    * so the static trip-prefix and CHANGE frames are pinned once, not per
    * routing call. */
  def run(nodes: DataFrame, changeEdges: DataFrame, sources: Set[Long],
      maxIterations: Int = 1000): DataFrame =
    new TransitSssp(nodes, changeEdges).run(sources, maxIterations)
}

/** See the companion's scaladoc above for the algorithm. Instances hold the
  * call-invariant state: the per-trip ride-cost prefix and the CHANGE edge
  * slice, both checkpointed lazily on first use and shared by every run. */
final class TransitSssp(nodes: DataFrame, changeEdges: DataFrame) {

  private val spark = nodes.sparkSession
  private val bridge = org.apache.spark.sql.graftbridge.CheckpointBridge
  /** Shuffle-partition count every pinned frame targets; rePin re-attaches
    * the layout metadata AQE strips from checkpoints (see
    * CheckpointBridge.rePin — count-guarded, so coalesced fixture-scale
    * frames safely stay unpinned). */
  private val nPart = spark.sessionState.conf.numShufflePartitions

  private val wTrip = Window.partitionBy("trip_id").orderBy("stop_sequence")
  private val wSrcTrip =
    Window.partitionBy("src", "trip_id").orderBy("stop_sequence")
  private val pref = wSrcTrip.rowsBetween(Window.unboundedPreceding, -1)
  /** Ride closure in rel space: rel after riding from any earlier same-trip
    * row — transitively complete in one window pass (pure prefix-min; the
    * A(u) offsets are already folded out of the representation). */
  private val rideCol = least(col("dist"), min(col("dist")).over(pref))

  // Static per-trip ride-cost prefix: A(first) = 0,
  // A(u) = A(u−1) + (arr(u) − dep(u−1)) — so chain cost v→u = A(u) − A(v)
  // equals the sum of the PRECEDES hop weights including intermediate
  // dwells. Checkpointed once per projection; every call reads the pins.
  @volatile private var preparedForced = false
  @volatile private var changeForced = false

  private lazy val prepared = {
    val t0 = System.nanoTime()
    val p = nodes
      .select(col("id"), col("trip_id"), col("stop_sequence"),
        col("arr_secs"), col("dep_secs"))
      .withColumn("hop_w",
        (col("arr_secs") - lag("dep_secs", 1).over(wTrip)).cast("double"))
      .withColumn("acum", coalesce(
        sum("hop_w").over(wTrip.rowsBetween(Window.unboundedPreceding, 0)),
        lit(0.0)))
      // dep_secs stays on the pin so a clock-capped run can drop
      // beyond-horizon rows from the grid at construction (see staged)
      .select(col("id"), col("trip_id"), col("stop_sequence"), col("acum"),
        col("dep_secs"))
      // by-construction pin (r12): the helper itself lays the frame out
      // on hash(trip_id) before checkpointing, so the attached claim can
      // never diverge from the data (one extra one-time Exchange per
      // projection — the window above already left hash(trip_id), but
      // the explicit repartition is what makes the claim verifiable)
      .transform(bridge.pinnedCheckpoint(_, nPart, Seq("trip_id"), Seq.empty,
        TransitSssp.ckptPin))
    TransitSssp.tlog(f"trip-prefix pin ${(System.nanoTime() - t0) / 1e9}%.2f s")
    preparedForced = true
    p
  }

  /** Node count, read once from the pinned prefix — sizes the sparse-tail
    * switch threshold. */
  private lazy val nodeCount: Long = prepared.count()

  // CHANGE slice pinned once — iterations must not re-derive it from the
  // projected union per round. Each edge carries BOTH endpoints'
  // (trip_id, stop_sequence) positions — every in-loop join is positional
  // (the grid rows carry no ids) — plus the endpoint ids for predecessor
  // output, and the pre-folded rel-space weight
  // w_rel = A(src) + w − A(dst) (integer-valued, so fixpoint equalities
  // stay exact). Pinned REPARTITIONED on hash(s_trip) at the session's
  // shuffle-partition count — the same partitioning family the grid's
  // window Exchange produces — and sorted (s_trip, s_seq), so the
  // per-round frontier→edge join moves and sorts only the frontier:
  // both sides satisfy the join's distribution on the trip key, and the
  // slice's pinned sort already matches the SMJ order.
  private lazy val change = {
    val t0 = System.nanoTime()
    val srcPos = prepared.select(col("id").as("e_src"),
      col("trip_id").as("s_trip"), col("stop_sequence").as("s_seq"),
      col("acum").as("s_acum"))
    val tgtPos = prepared.select(col("id").as("e_dst"),
      col("trip_id").as("d_trip"), col("stop_sequence").as("d_seq"),
      col("acum").as("d_acum"))
    val n = spark.sessionState.conf.numShufflePartitions
    val c = changeEdges.select(col("source").as("e_src"),
      col("target").as("e_dst"), col("waiting_time").cast("double").as("w"))
      .join(tgtPos, Seq("e_dst"))
      .join(srcPos, Seq("e_src"))
      .select(col("e_src"), col("e_dst"), col("s_trip"), col("s_seq"),
        col("d_trip"), col("d_seq"),
        (col("s_acum") + col("w") - col("d_acum")).as("w_rel"),
        // d_acum rides on the slice (+8 B/row) so a capped run can test a
        // candidate's ABSOLUTE cost (rel + d_acum) without a second join
        col("d_acum"))
      .transform(bridge.pinnedCheckpoint(_, n, Seq("s_trip"),
        Seq("s_trip", "s_seq"), TransitSssp.ckptPin))
    TransitSssp.tlog(f"change-slice pin ${(System.nanoTime() - t0) / 1e9}%.2f s")
    changeForced = true
    c
  }

  /** Trip-level CHANGE adjacency (s_trip → d_trip, distinct) — the
    * dimension the sparse tail expands its frontier trip set through
    * before pulling a slice (see sparseTail). One row per trip PAIR with
    * any transfer; derived and pinned lazily on first batched-tail
    * engagement only. */
  @volatile private var tripAdjForced = false
  private lazy val tripAdj = {
    val t0 = System.nanoTime()
    val a = change.select(col("s_trip"), col("d_trip")).distinct()
      .transform(TransitSssp.ckptPin)
    TransitSssp.tlog(f"trip-adjacency pin ${(System.nanoTime() - t0) / 1e9}%.2f s")
    tripAdjForced = true
    a
  }

  /** Per-trip grid row count — the expansion budget is ROW-based (trip
    * lengths vary 2 .. 500+ across feeds, so a pair count misprices the
    * slice). From the UNCAPPED prefix: a clock-capped grid has fewer
    * rows per trip, so the estimate only overstates — conservative. */
  @volatile private var tripLenForced = false
  private lazy val tripLen = {
    val d = prepared.groupBy("trip_id").agg(count(lit(1)).as("len"))
      .transform(TransitSssp.ckptPin)
    tripLenForced = true
    d
  }

  /** sources: seed vertex ids (dist 0, pred −1). Output matches
    * ShortestPaths.distancesDF: (vertex_id, source_id, dist, pred). */
  def run(sources: Set[Long], maxIterations: Int = 1000): DataFrame = {
    import spark.implicits._
    if (sources.isEmpty)
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("vertex_id", "source_id", "dist", "pred")
    resolveState(converge(sources, maxIterations), sources.toSeq.sorted)
  }

  /** Converged-state handle for callers that rank BEFORE they need a path
    * (the routing engine): `distances` is a plain projection of the grid —
    * none of the predecessor-resolution windows/joins run — and
    * `resolve(source)` runs the resolution for ONE chosen source (exact:
    * resolution is per-(src, v) independent, so single-source output equals
    * the all-sources output filtered). `release()` frees the converged grid
    * once every derived frame has been consumed. */
  final class Staged private[TransitSssp] (state: DataFrame, sources: Seq[Long]) {
    // The grid stores rel distances and no ids; ONE position join against
    // the pinned trip prefix restores both (dist = rel + A, id) — the
    // prefix side is already partitioned/sorted on the join key, so only
    // the reached rows sort. Output-time cost, paid once per routing call
    // instead of 8 B × grid × rounds of checkpoint churn.
    def distances: DataFrame = state.filter(col("dist").isNotNull)
      .join(prepared, Seq("trip_id", "stop_sequence"))
      .select(col("id").as("vertex_id"), col("src").as("source_id"),
        (col("dist") + col("acum")).as("dist"))
    def resolve(source: Long): DataFrame = {
      require(sources.contains(source), s"$source is not a seed of this run")
      resolveState(state.filter(col("src") === source), Seq(source))
    }
    def release(): Unit =
      org.apache.spark.sql.graftbridge.CheckpointBridge.unpersistCheckpoint(state)
  }

  /** See [[Staged]]. `sources` must be non-empty.
    *
    * `costCap`: prune candidate merges whose ABSOLUTE cost (rel + A)
    * exceeds the cap. Exact for any consumer that only reads distances
    * ≤ cap: cost is monotone along time-expanded paths (every edge weight
    * is a non-negative elapsed increment), so a beyond-cap candidate can
    * never lie on an optimal path to a within-cap vertex, and the optimal
    * predecessor chain of a within-cap vertex is entirely within cap. The
    * routing engine passes its temporal-horizon bound — the flood then
    * stops at the horizon instead of relaxing the rest of the service day
    * (the 30×-grid measurement: most of the multi-million-row flood and
    * the long change-depth dribble tail arrive after the horizon). The
    * full-table contract (oracle `run`, TransitBetweenness) stays
    * uncapped. */
  /** `clockCap`: additionally drop grid rows whose departure clock exceeds
    * the cap BEFORE iterating. Exact for the same consumers: event times
    * increase monotonically along a time-expanded path, so every stoptime
    * on a path to a target departing before the horizon itself departs
    * before the horizon. This shrinks the GRID (every scan, window,
    * checkpoint, and tail slice), where the cost cap only shrinks the
    * candidate flow — measured the dominant effect at 10×/30×. */
  def staged(sources: Set[Long], maxIterations: Int = 1000,
      costCap: Double = Double.PositiveInfinity,
      clockCap: Double = Double.PositiveInfinity): Staged = {
    require(sources.nonEmpty, "staged() needs at least one seed")
    new Staged(converge(sources, maxIterations, costCap, clockCap),
      sources.toSeq.sorted)
  }

  /** Label-correcting iteration to the fixpoint; returns the converged
    * grid (src, trip_id, stop_sequence, dist, fresh) with dist in REL
    * space (dist_abs = dist + A(trip_id, stop_sequence)). Package
    * access: [[TransitBetweenness]] runs its forward hop-BFS through this
    * (ride weight = Δposition, change weight = 1 — same operator, where
    * A(u) = pos(u) − 1 so dist_abs = rel + stop_sequence − 1), then
    * derives sigma/delta from the grid. */
  private[graph] def converge(sources: Set[Long], maxIterations: Int = 1000,
      costCap: Double = Double.PositiveInfinity,
      clockCap: Double = Double.PositiveInfinity): DataFrame =
    convergeCounted(sources, maxIterations, costCap, clockCap)._1

  /** converge plus the iteration count the run took — the count bounds the
    * change-depth of every optimal path, which downstream phases
    * (TransitBetweenness's sigma/delta sweeps) use as their own round
    * budget. */
  private[graph] def convergeCounted(sources: Set[Long],
      maxIterations: Int,
      costCap: Double = Double.PositiveInfinity,
      clockCap: Double = Double.PositiveInfinity): (DataFrame, Int) = {
    import spark.implicits._
    // The iteration STATE is the full (source × stoptime) grid with a
    // nullable dist and a `fresh` flag (dist arrived via a CHANGE merge
    // last round, so this row's own out-edges have not fired yet — seeds
    // start fresh). Carrying the grid itself — instead of a separate
    // reached-set joined back in every round — matters for the plan:
    // localCheckpoint preserves the physical partitioning/ordering, so
    // after the first round the prefix-min window plans with NO Exchange
    // and NO Sort, and the candidate merge (keyed on the grid's own
    // layout — see below) moves only the candidate side. Every iteration
    // runs with the grid pinned in place, flood rounds included.
    val srcDim = sources.toSeq.sorted.toDF("src")
    // Clock-capped grid: beyond-horizon rows never lie on a path to a
    // within-horizon target (event times only move forward), so a capped
    // run excludes them from the ITERATION STATE entirely — the window,
    // the candidate merge (out-of-grid candidate targets die in the left
    // join), every checkpoint, and the sparse-tail slices all shrink to
    // the horizon's share of the service day.
    val gridBase =
      if (clockCap.isPosInfinity) prepared
      else prepared.filter(col("dep_secs") <= clockCap)
    var state = gridBase.crossJoin(broadcast(srcDim))
      .withColumn("dist", when(col("id") === col("src"), -col("acum")))
      .withColumn("fresh", col("dist").isNotNull)
      .select("src", "trip_id", "stop_sequence", "dist", "fresh")

    // Sparse-tail switch: once a round improves fewer rows than this AND
    // the frontier is DECAYING, remaining rounds run over a trip-slice +
    // small overlay (see the tail loop below) instead of rewriting the
    // full grid. 1/128 of the grid bounds the first sparse slice at ~1 %
    // of a full round's rows (threshold rows × ~25-row trips / grid). The
    // decay condition matters: round 0's improvement count is just the
    // seed handful, BEFORE the flood — switching there would push the
    // entire flood through overlay machinery (measured 2-4× slower than
    // full rounds at 10× Modena); the tail is where improvements are
    // both small and shrinking.
    val sparseThreshold =
      math.max(1024L, nodeCount * sources.size / 128L)
    var it = 0
    var converged = false
    var sparse = false
    var prevImproved = -1L
    while (it < maxIterations && !converged && !sparse) {
      val itT0 = System.nanoTime()
      val ride = state.withColumn("rdist", rideCol)
      // Delta frontier: only rows whose value is new since their out-edges
      // last fired can improve a neighbor — ride improvements this round,
      // plus rows merged from candidates last round (`fresh`).
      val changed = ride.filter(col("rdist").isNotNull &&
        (col("fresh") || col("dist").isNull || col("rdist") < col("dist")))
      // Candidate merge keyed on (src, trip_id, stop_sequence) — the
      // target's position, not its id ((trip_id, stop_sequence) is the
      // node's primary key). The GRID side satisfies the merge join's
      // distribution by the subset rule: its checkpoint-preserved
      // partitioning is hash(trip_id) ⊆ the join keys, and its window
      // sort (src, trip_id, stop_sequence) IS the SMJ sort order. Only
      // candMin (frontier-sized) shuffles into the grid's layout — the
      // r9 (src, id) key forced a grid-sized Exchange here AND a second
      // one at the next round's window, the 30–47 s/round dominant cost
      // of a 10×-Modena route (COVERAGE.md distributed section). The
      // frontier→edge join on (s_trip, s_seq) is Exchange-free on BOTH
      // sides (r11): the frontier inherits the grid's hash(trip_id) and
      // the slice is pinned on hash(s_trip) at the same partition count,
      // so only the frontier-sized sort runs.
      val candRaw = changed
        .select(col("src"), col("trip_id"), col("stop_sequence"), col("rdist"))
        .join(change, col("trip_id") === col("s_trip") &&
          col("stop_sequence") === col("s_seq"))
      val candMin =
        (if (costCap.isPosInfinity) candRaw
         else candRaw.filter(col("rdist") + col("w_rel") + col("d_acum") <= costCap))
        .groupBy(col("src"), col("d_trip"), col("d_seq"))
        .agg(min(col("rdist") + col("w_rel")).as("cdist"))
        .withColumnRenamed("d_trip", "trip_id")
        .withColumnRenamed("d_seq", "stop_sequence")
      val merged = ride.join(candMin, Seq("src", "trip_id", "stop_sequence"), "left")
        .withColumn("ndist", least(col("rdist"), col("cdist")))
      // The convergence test rides INSIDE the checkpoint job: observe()
      // plants a CollectMetrics node whose aggregate is computed by the
      // same tasks that materialize the grid, so an iteration is ONE Spark
      // job, not checkpoint + a second agg scan over the cached state.
      // The name must be unique across CONCURRENT runs, not just rounds:
      // the observation listener matches by metric name over every query
      // execution in the session, so two simultaneous routing calls both
      // emitting "round-0" could cross-read each other's improvement count
      // and converge early on the wrong run.
      val obs = org.apache.spark.sql.Observation(
        s"transit-sssp-${TransitSssp.runSeq.incrementAndGet()}-round-$it")
      val newState = merged
        .observe(obs, coalesce(sum((col("ndist").isNotNull &&
          (col("dist").isNull || col("ndist") < col("dist"))).cast("long")),
          lit(0L)).as("improved"))
        .select(col("src"), col("trip_id"), col("stop_sequence"),
          col("ndist").as("dist"),
          (col("cdist").isNotNull && (col("rdist").isNull ||
            col("cdist") < col("rdist"))).as("fresh"))
        .transform(TransitSssp.ckpt)
      val improved = obs.get("improved").asInstanceOf[Long]
      converged = improved == 0L
      sparse = !converged && improved <= sparseThreshold &&
        prevImproved >= 0L && improved < prevImproved
      prevImproved = improved
      TransitSssp.tlog(f"round $it%d improved=$improved%d " +
        f"${(System.nanoTime() - itT0) / 1e9}%.2f s" +
        (if (sparse) " -> sparse tail" else ""))
      // newState is materialized (eager checkpoint), so the superseded
      // grid's blocks are dead — release them NOW instead of waiting for
      // the ContextCleaner's GC-driven pass. Without this, a 10×-Modena
      // route keeps ~15 superseded ~600 MB grids alive and later rounds
      // slow down under block-store pressure (measured in COVERAGE.md's
      // distributed scale section). Live checkpoint state is now bounded
      // by TWO grids per run regardless of round count.
      org.apache.spark.sql.graftbridge.CheckpointBridge.unpersistCheckpoint(state)
      state = newState
      it += 1
    }
    if (sparse) return sparseTail(state, it, maxIterations, costCap)
    if (!converged) throw new IllegalStateException(
      s"TransitSssp did not converge in $maxIterations iterations — " +
        "optimal paths deeper than the bound (raise maxIterations)")
    (state, it)
  }

  /** Sparse-tail rounds: once the frontier dribbles (late tail of a run —
    * measured 10×-Modena routes spend up to 7 rounds merging a few
    * thousand improvements each, at a full 7.5M-row grid rewrite per
    * round), the grid stops moving ENTIRELY. The last full checkpoint
    * becomes the static `base`; the mutable state is a small OVERLAY of
    * (src, position) → (dist, fresh) rows that differ from base. A round
    * touches only the trips containing a fresh overlay row: it pulls
    * those trips' rows from base (broadcast semi-join — the grid scan is
    * a partition-local in-memory filter, no Exchange), coalesces the
    * overlay in, and runs the SAME ride-window + CHANGE-candidate
    * operators full rounds run, so the semantics are unchanged operator
    * for operator. Ride improvements fire all their effects in-round
    * (window transitivity + candidate join) and enter the overlay
    * non-fresh; candidate improvements enter fresh (their out-edges fire
    * next round). Converged = a round with zero improvements — the same
    * fixpoint test as the full loop, on the same operator. One full-grid
    * merge materializes the final state (replacing N tail-round grid
    * rewrites with one), after which base and overlay are released; the
    * returned frame carries the full-round schema, so every consumer
    * (Staged, resolveState, TransitBetweenness) is oblivious.
    *
    * Overlay merges join on (src, trip_id, stop_sequence) — the grid's
    * primary key in its own partitioning terms — so neither the slice
    * pull, the candidate-target probe, nor the final merge ever
    * re-Exchanges base. All per-round actions run over overlay-sized
    * frames; fixture-scale runs switch to this loop after round 0
    * (threshold floor 1024 rows), so every routing parity spec and the
    * per-round `gtfs_routing_distributed` oracle exercise it.
    *
    * K-DEPTH BATCHING (r12 — the r11 verdict's top item): the un-batched
    * tail paid the O(grid) base touch (slice pull + candidate-target
    * probe) plus a fixed ~3-broadcast/3-AQE-job scheduling floor on EVERY
    * round, for rounds merging only O(1k) improvements — ≈216 s of a 30×
    * center pair, ≈600 s of the 100× probe. A materialized round now
    * expands the frontier's (src, trip) set up to [[TransitSssp.tailK]]
    * change-hops through the pinned trip-level adjacency (tripAdj — tiny:
    * one row per trip pair with any transfer), pulls ONE base slice and
    * ONE change slice covering the expansion, and then iterates the
    * ride∘change operator up to k times entirely against those
    * slice-sized frames: inner depth d's frontier sits within d hops of
    * the original frontier, so its candidates land within d+1 ≤ k hops —
    * inside the slice by construction — and the candidate probe reads the
    * slice's own current values, never base. The O(grid) touch and the
    * grid-scheduling floor are paid once per k depths instead of once per
    * depth. Adaptivity, all measured-first: (a) batching only engages at
    * all above [[TransitSssp.tailBatchMinBase]] grid rows — below it tail
    * rounds are sub-second and the expansion's per-hop checkpoint job
    * costs more than the base touches it saves (measured at 3×: 6.8 s
    * single-depth batched rounds vs ~1–2 s un-batched); (b) the expansion
    * budget is ROW-based through the tripLen dimension (trip lengths vary
    * 2..500+ across feeds — a pair count misprices grid-style feeds),
    * bounded at ~1/6 of base so k inner rounds cost about one full-base
    * round; (c) an expansion that CLOSES (no new trips — the end-game)
    * runs inner rounds to convergence with no further pulls at all;
    * (d) an un-closed expansion with fewer than 2 hops (hub-dense
    * adjacency hitting the budget immediately) falls back to the plain
    * un-batched round, so the batch path never costs more than the shape
    * it replaces. Inner rounds share the full round's operators verbatim;
    * a zero-improvement inner round is the same global fixpoint test
    * (every fresh row's effects were evaluated in-slice), so convergence
    * is unchanged. */
  private def sparseTail(lastFull: DataFrame, itStart: Int,
      maxIterations: Int,
      costCap: Double = Double.PositiveInfinity): (DataFrame, Int) = {
    val rel = org.apache.spark.sql.graftbridge.CheckpointBridge.unpersistCheckpoint _
    // Scan-many, write-once: re-materialize the frozen base deserialized
    // (see deserializedTailBase) so the 2-scans-per-round tail doesn't
    // re-pay SER decode on every slice pull and candidate probe.
    val base =
      if (TransitSssp.deserializedTailBase && TransitSssp.serializedGrid) {
        val t0 = System.nanoTime()
        val b = org.apache.spark.sql.graftbridge.CheckpointBridge.flattenStats(
          lastFull.localCheckpoint(true))
        rel(lastFull)
        TransitSssp.tlog(f"tail base deser copy ${(System.nanoTime() - t0) / 1e9}%.2f s")
        b
      } else lastFull
    val posKey = Seq("src", "trip_id", "stop_sequence")
    var ov = base.filter(col("fresh"))
      .select(col("src"), col("trip_id"), col("stop_sequence"),
        col("dist"), col("fresh"))
      .transform(TransitSssp.ckpt)
    val baseCount = base.count()
    val batchEnabled = baseCount >= TransitSssp.tailBatchMinBase
    // ROW-based expansion budget (trip lengths vary 2..500+ across
    // feeds): a batched slice stays ≤ ~1/6 of base, so k inner rounds
    // over it cost about one full-base round while replacing k base
    // touches. The pair cap bounds the broadcast the slice pull ships.
    val rowBudget = math.max(65536L, baseCount / 6L)
    val pairMax = 512L * 1024L
    val kMax = math.max(1, TransitSssp.tailK)
    var it = itStart
    var converged = false

    // One ride∘change application over (curBase ∪ overlay). `inSlice`:
    // candidate targets are guaranteed inside curBase (a batched slice
    // covering every reachable trip this depth), so the probe reads the
    // ride frame's own current values; otherwise they are probed against
    // full base + overlay. The improvement count rides the checkpoint job
    // via observe() — same one-job pattern as the full loop.
    def round(curBase: DataFrame, candEdges: DataFrame,
        inSlice: Boolean, label: String): Long = {
      val itT0 = System.nanoTime()
      def lap(t0: Long): String = f"${(System.nanoTime() - t0) / 1e9}%.2f"
      val cur = curBase
        .join(ov.select(col("src"), col("trip_id"), col("stop_sequence"),
          col("dist").as("o_dist"), col("fresh").as("o_fresh")), posKey, "left")
        .select(col("src"), col("trip_id"), col("stop_sequence"),
          coalesce(col("o_dist"), col("dist")).as("dist"),
          coalesce(col("o_fresh"), col("fresh")).as("fresh"))
      // The slice is overlay-sized — pin it so the three consumers below
      // (changed/candMin, rideImp) don't each re-run the scan + window
      val ride = cur.withColumn("rdist", rideCol).transform(TransitSssp.ckpt)
      val tRide = lap(itT0)
      val changed = ride.filter(col("rdist").isNotNull &&
        (col("fresh") || col("dist").isNull || col("rdist") < col("dist")))
      // broadcast the FRONTIER side: the un-batched CHANGE slice is
      // edge-count-sized and an un-hinted join would sort/shuffle all of
      // it per round to meet a few hundred frontier rows — the hint turns
      // it into one streamed scan (of the expansion-sized candEdges when
      // batched)
      val candRaw = candEdges
        .join(broadcast(changed.select(col("src"), col("trip_id"),
          col("stop_sequence"), col("rdist"))),
          col("trip_id") === col("s_trip") &&
            col("stop_sequence") === col("s_seq"))
      val candMin =
        (if (costCap.isPosInfinity) candRaw
         else candRaw.filter(col("rdist") + col("w_rel") + col("d_acum") <= costCap))
        .groupBy(col("src"), col("d_trip"), col("d_seq"))
        .agg(min(col("rdist") + col("w_rel")).as("cdist"))
        .withColumnRenamed("d_trip", "trip_id")
        .withColumnRenamed("d_seq", "stop_sequence")
      val rideImp = ride
        .filter(col("rdist").isNotNull &&
          (col("dist").isNull || col("rdist") < col("dist")))
        .select(col("src"), col("trip_id"), col("stop_sequence"),
          col("rdist").as("dist"), lit(false).as("fresh"))
      // candidate targets probed against their CURRENT value; strict-
      // improvement filters keep the overlay minimal. In-slice: targets
      // land within the expansion by construction and `ride` already
      // carries slice ∪ overlay (rdist = current best incl. this round's
      // rides), so no base touch at all.
      val candImp =
        if (inSlice)
          ride.join(broadcast(candMin), posKey)
            .filter(col("rdist").isNull || col("cdist") < col("rdist"))
            .select(col("src"), col("trip_id"), col("stop_sequence"),
              col("cdist").as("dist"), lit(true).as("fresh"))
        else
          base.join(broadcast(candMin), posKey)
            .join(ov.select(col("src"), col("trip_id"), col("stop_sequence"),
              col("dist").as("o_dist")), posKey, "left")
            .withColumn("cur", coalesce(col("o_dist"), col("dist")))
            .filter(col("cur").isNull || col("cdist") < col("cur"))
            .select(col("src"), col("trip_id"), col("stop_sequence"),
              col("cdist").as("dist"), lit(true).as("fresh"))
      val tImp0 = System.nanoTime()
      val obs = org.apache.spark.sql.Observation(
        s"transit-tail-${TransitSssp.runSeq.incrementAndGet()}")
      val imp = rideImp.unionByName(candImp)
        .observe(obs, count(lit(1)).as("n"))
        .transform(TransitSssp.ckpt)
      rel(ride)
      val nImp = obs.get("n").asInstanceOf[Long]
      val tImp = lap(tImp0)
      if (nImp == 0L) rel(imp)
      else {
        // processed fresh rows have fired all effects — clear the flag;
        // per position keep the best dist (ties prefer fresh = refire,
        // which is monotone-safe)
        val wPick = Window.partitionBy(posKey.map(col): _*)
          .orderBy(col("dist").asc, col("fresh").desc)
        val mergedOv = ov.withColumn("fresh", lit(false)).unionByName(imp)
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1).drop("rn")
          .transform(TransitSssp.ckpt)
        rel(ov); rel(imp)
        ov = mergedOv
      }
      TransitSssp.tlog(f"sparse round $it%d $label%s improved=$nImp%d " +
        f"${(System.nanoTime() - itT0) / 1e9}%.2f s " +
        f"(slice+ride $tRide, cand+imp $tImp)")
      nImp
    }

    def frontierTrips = ov.filter(col("fresh")).select("src", "trip_id").distinct()

    if (!batchEnabled) {
      // fixture/small-scale shape — identical to the un-batched loop
      while (it < maxIterations && !converged) {
        val n = round(base.join(broadcast(frontierTrips), Seq("src", "trip_id")),
          change, inSlice = false, "legacy")
        converged = n == 0L
        it += 1
      }
    } else while (it < maxIterations && !converged) {
      val mT0 = System.nanoTime()
      // ---- expansion: frontier trips + up to kMax change hops, each hop
      // ONE checkpoint job (pair count + slice-row estimate ride on it
      // via observe) ----
      def counted(df: DataFrame): (DataFrame, Long, Long) = {
        val obs = org.apache.spark.sql.Observation(
          s"transit-exp-${TransitSssp.runSeq.incrementAndGet()}")
        val d = df
          .observe(obs, count(lit(1)).as("cnt"),
            coalesce(sum(col("len")), lit(0L)).as("rows"))
          .transform(TransitSssp.ckpt)
        (d, obs.get("cnt").asInstanceOf[Long], obs.get("rows").asInstanceOf[Long])
      }
      val (frontTrips, fCnt, fRows) =
        counted(frontierTrips.join(broadcast(tripLen), Seq("trip_id"))
          .select(col("src"), col("trip_id"), col("len")))
      var expanded = frontTrips
      var expCnt = fCnt
      var expRows = fRows
      var hops = 0
      var closed = false
      var budgetHit = expRows > rowBudget || expCnt > pairMax
      while (hops < kMax && !closed && !budgetHit) {
        val (grown, c, r) = counted(expanded.unionByName(
            expanded.select(col("src"), col("trip_id").as("s_trip"))
              .join(tripAdj, Seq("s_trip"))
              .select(col("src"), col("d_trip").as("trip_id"))
              .join(broadcast(tripLen), Seq("trip_id"))
              .select(col("src"), col("trip_id"), col("len")))
          .distinct())
        if (c > pairMax || r > rowBudget) { rel(grown); budgetHit = true }
        else {
          if (expanded ne frontTrips) rel(expanded)
          closed = c == expCnt
          expanded = grown; expCnt = c; expRows = r; hops += 1
        }
      }
      // Batch only when it can actually batch: a closed expansion (the
      // reachable trip set is adjacency-complete — every future candidate
      // lands in-slice, inner rounds may run to convergence with no
      // further pulls) or ≥ 2 depths. hops < 2 un-closed means the
      // expansion budget bit immediately (hub-dense adjacency) — the
      // slice machinery would cost more than the one base touch it
      // saves, so run the plain un-batched round instead.
      if (closed || hops >= 2) {
        val kEff = if (closed) Int.MaxValue else hops
        val pairs = expanded.select("src", "trip_id")
        val distinctTrips = expanded.select("trip_id").distinct()
          .withColumnRenamed("trip_id", "s_trip")
        // ONE partition-local base scan and ONE change scan for the
        // whole batch; both slices are expansion-sized
        val sliceBase = base.join(broadcast(pairs), Seq("src", "trip_id"))
          .transform(TransitSssp.ckpt)
        val candEdges = change.join(broadcast(distinctTrips), Seq("s_trip"))
          .transform(TransitSssp.ckpt)
        val tPull = f"${(System.nanoTime() - mT0) / 1e9}%.2f"
        var depth = 0
        while (depth < kEff && !converged && it < maxIterations) {
          converged = round(sliceBase, candEdges, inSlice = true,
            s"batch-depth-$depth") == 0L
          it += 1
          depth += 1
        }
        rel(sliceBase); rel(candEdges)
        TransitSssp.tlog(f"sparse batch hops=$hops%d closed=$closed%s " +
          f"pairs=$expCnt%d rows=$expRows%d depths=$depth%d pull $tPull " +
          f"${(System.nanoTime() - mT0) / 1e9}%.2f s")
      } else {
        converged = round(
          base.join(broadcast(frontTrips.select("src", "trip_id")),
            Seq("src", "trip_id")),
          change, inSlice = false, "unbatched") == 0L
        it += 1
      }
      if (expanded ne frontTrips) rel(expanded)
      rel(frontTrips)
    }
    if (!converged) throw new IllegalStateException(
      s"TransitSssp did not converge in $maxIterations iterations — " +
        "optimal paths deeper than the bound (raise maxIterations)")
    val mT0 = System.nanoTime()
    val full = base
      .join(ov.select(col("src"), col("trip_id"), col("stop_sequence"),
        col("dist").as("o_dist")), posKey, "left")
      .select(col("src"), col("trip_id"), col("stop_sequence"),
        coalesce(col("o_dist"), col("dist")).as("dist"),
        lit(false).as("fresh"))
      .transform(TransitSssp.ckpt)
    rel(base); rel(ov)
    TransitSssp.tlog(f"sparse merge ${(System.nanoTime() - mT0) / 1e9}%.2f s")
    (full, it)
  }

  /** Release the instance's pinned static frames (trip prefix + CHANGE
    * slice) — for short-lived instances (one betweenness call) that should
    * not leave checkpoint blocks behind. Projection-held instances keep
    * their pins for the projection's lifetime and never call this. */
  private[graph] def releasePins(): Unit = {
    val rel = org.apache.spark.sql.graftbridge.CheckpointBridge.unpersistCheckpoint _
    if (preparedForced) rel(prepared)
    if (changeForced) rel(change)
    if (tripAdjForced) rel(tripAdj)
    if (tripLenForced) rel(tripLen)
  }

  /** Predecessor resolution against the CONVERGED rel distances:
    * candidates are (a) trip predecessor where the single-hop fixpoint
    * equality holds — in rel space simply rel(u) = rel(pred) (the A
    * offsets telescope out), (b) CHANGE sources where
    * rel(dst) = rel(src) + w_rel, (c) the seeds themselves (pred −1,
    * always preferred). All arithmetic is on integer-valued doubles —
    * equality is exact. Candidates key on the grid's own
    * (trip_id, stop_sequence) position; ids and absolute distances are
    * restored by position joins against the pinned trip prefix — once
    * for the ride preds (pred row's id), once for the picked output.
    * Pre-filtering to reached rows is safe for the ride lag: if
    * rel(u) = rel(p̃) for a reached earlier row p̃, every intermediate
    * trip row is reachable through that same ride at the fixpoint, so
    * the filtered lag still pairs immediate neighbors. Per-(src, v)
    * independent, so it may run over a source-filtered grid slice
    * (Staged.resolve). */
  private def resolveState(state: DataFrame, sources: Seq[Long]): DataFrame = {
    import spark.implicits._
    val reached = state.filter(col("dist").isNotNull)
    val rideCand = reached
      .withColumn("p_seq", lag("stop_sequence", 1).over(wSrcTrip))
      .withColumn("p_rel", lag("dist", 1).over(wSrcTrip))
      .filter(col("p_rel").isNotNull && col("dist") === col("p_rel"))
      .join(prepared.select(col("trip_id"),
        col("stop_sequence").as("p_seq"), col("id").as("pred")),
        Seq("trip_id", "p_seq"))
      .select(col("src"), col("trip_id"), col("stop_sequence"),
        col("dist").as("rel"), col("pred"), lit(1).as("prio"))
    // CHANGE fixpoint edges: slice × reached source rows (positional; the
    // pinned slice and the grid co-partition on the trip key) probed
    // against the target's own grid row.
    val dv = reached.select(col("src"), col("trip_id").as("s_trip"),
      col("stop_sequence").as("s_seq"), col("dist").as("s_rel"))
    val dt = reached.select(col("src"), col("trip_id").as("d_trip"),
      col("stop_sequence").as("d_seq"), col("dist").as("t_rel"))
    val changeCand = change
      .join(dv, Seq("s_trip", "s_seq"))
      .join(dt, Seq("src", "d_trip", "d_seq"))
      .filter(col("t_rel") === col("s_rel") + col("w_rel"))
      .select(col("src"), col("d_trip").as("trip_id"),
        col("d_seq").as("stop_sequence"), col("t_rel").as("rel"),
        col("e_src").as("pred"), lit(1).as("prio"))
    // Seeds: position + rel (= −A) read off the pinned prefix. Seeds
    // ABSENT from the projection have no grid row — they rejoin as
    // phantom self-rows after the widen (contract: every seed reports
    // itself at dist 0).
    val sidDim = sources.sorted.toDF("sid")
    val seedCand = prepared
      .join(broadcast(sidDim), col("id") === col("sid"))
      .select(col("id").as("src"), col("trip_id"), col("stop_sequence"),
        (-col("acum")).as("rel"), lit(-1L).as("pred"), lit(0).as("prio"))
    val wPick = Window.partitionBy("src", "trip_id", "stop_sequence")
      .orderBy(col("prio"), col("pred"))
    val resolved = rideCand.unionByName(changeCand).unionByName(seedCand)
      .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .join(prepared, Seq("trip_id", "stop_sequence"))
      .select(col("id").as("vertex_id"), col("src").as("source_id"),
        (col("rel") + col("acum")).as("dist"), col("pred"))
    val phantom = sidDim
      .join(prepared.select(col("id").as("sid")), Seq("sid"), "left_anti")
      .select(col("sid").as("vertex_id"), col("sid").as("source_id"),
        lit(0.0).as("dist"), lit(-1L).as("pred"))
    resolved.unionByName(phantom)
  }
}
