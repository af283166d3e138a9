package graft

/** Process-level lifecycle surface for embedders (r17, r16 verdict
  * stretch #7): the harnesses already practice cache hygiene — Verify and
  * Bench drain the Pipeline builder-retained caches between queries and
  * the staged routing runs own their `release()` — but an embedder had to
  * know each registry by name. One call gives them the same hygiene.
  */
object Runtime {

  /** Drain every library-GLOBAL retained-cache registry. Currently that is
    * the Pipeline builder-retained caches (the contamination rows'
    * benchmark-gram cache, which the returned plan still reads and so
    * cannot be unpersisted at build time); any future global registry must
    * be added here — this method is the contract that "releaseAll releases
    * everything the library retains process-wide".
    *
    * Safe whenever no returned plan is mid-consumption; a later
    * re-execution of an already-returned plan silently re-scans instead of
    * reading the released cache — correct, just slower. Engine-OWNED
    * caches are per-instance, not global, and stay with their owners:
    * `RoutingEngine.close()`, `FootwayEngine.unpersist()`,
    * `TimeExpandedGraph.unpersist()`. */
  def releaseAll(): Unit =
    graft.queries.Pipeline.releaseRetainedCaches()

  /** Library-global retained-cache entries currently outstanding — the
    * observability hook the release spec pins ([[releaseAll]] must leave
    * this at 0). */
  def retainedCount: Int = graft.queries.Pipeline.retainedCacheCount
}
