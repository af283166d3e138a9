// Lives under org.apache.spark.sql to reach execution.LogicalRDD — the
// node a localCheckpoint()ed Dataset's plan bottoms out in. Iterative
// operators (graft.graph.TransitSssp) checkpoint a superseded state every
// round; the blocks belong to the checkpoint's backing RDD, which
// Dataset.unpersist (CacheManager-scoped) never touches, so without an
// explicit release a long run keeps every round's grid alive until the
// ContextCleaner's GC-driven reclamation catches up — measured as
// progressively slower rounds at the 10×-Modena scale (COVERAGE.md,
// distributed scale section).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

object CheckpointBridge {
  /** Rewrap a checkpointed Dataset's LogicalRDD WITHOUT its origin
    * statistics, keeping the partitioning/ordering metadata that makes
    * pinned-frame joins Exchange-free.
    *
    * Why: `localCheckpoint` copies the ORIGIN plan's estimated statistics
    * onto the LogicalRDD (so downstream join planning sees realistic
    * sizes). In an iterative operator whose per-round plan joins the
    * checkpointed state with a frame DERIVED from that same state, the
    * size-only estimator multiplies the two sides, so the estimate's
    * exponent DOUBLES every round — by round ~30 the BigInt exceeds
    * BigInteger's supported range and planning throws
    * (`SizeInBytesOnlyStatsPlanVisitor` product overflow); well before
    * that, multi-million-bit BigInt products slow every round's
    * planning. Dropping originStats resets each round's leaves to the
    * session default size, keeping estimates depth-bounded. Runtime
    * join choices are unaffected in practice: AQE re-plans from ACTUAL
    * materialized sizes. No-op on non-LogicalRDD plans. */
  def flattenStats(df: Dataset[_]): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        org.apache.spark.sql.classic.Dataset.ofRows(session,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(session))
      case _ => df.toDF()
    }

  /** Release the storage of a `localCheckpoint(true)` result the caller has
    * finished with (every downstream consumer already materialized). No-op
    * on non-checkpoint Datasets — including DataFrames wrapped directly
    * over a user RDD (`spark.createDataFrame(rdd)` also analyzes to a bare
    * LogicalRDD, so the guard checks the RDD actually carries a checkpoint
    * mark rather than silently dropping a caller-managed RDD's storage).
    * Non-blocking.
    *
    * The guard is `isCheckpointed` — true for every eager
    * `localCheckpoint(true)` (the only thing graft call sites pass), false
    * for a plain wrapped RDD. A LAZY checkpoint not yet materialized also
    * reads false and is left alone — release-after-materialize is the
    * call-site contract anyway. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.isCheckpointed =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
