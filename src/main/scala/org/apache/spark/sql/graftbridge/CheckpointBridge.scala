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

  /** Rewrap a checkpointed Dataset with EXPLICIT partitioning/ordering
    * metadata — restoring what `localCheckpoint` silently drops under AQE.
    *
    * With adaptive execution enabled (every production session here), the
    * physical plan a checkpoint captures is AdaptiveSparkPlanExec, whose
    * outputPartitioning reads UnknownPartitioning — so every
    * "checkpoint-preserved partitioning" join in an iterative operator
    * was in fact re-Exchanging its pinned side each round. The caller
    * states the layout it ARRANGED (a user repartition(n, cols) or a
    * window's hash(cols) Exchange followed by in-place operators) and
    * this helper re-attaches it.
    *
    * SAFETY: the claim is only attached when the backing RDD's ACTUAL
    * partition count equals `expectedPartitions`. AQE partition
    * coalescing (small/fixture-scale frames) and skew-splitting both
    * change the count, and both produce layouts that are NOT a
    * HashPartitioning — the guard makes those degrade to the unpinned
    * (always-correct) plan instead of lying. User `repartition(n, cols)`
    * with an explicit n is never coalesced, so those pins always stick;
    * ENSURE_REQUIREMENTS exchanges stick exactly when the data was big
    * enough to not coalesce — i.e. at the scales where the pin matters.
    * Origin statistics are dropped as in [[flattenStats]].
    *
    * ORDERING CLAIMS: only pass `sortCols` when the checkpointed plan's
    * LAST physical operator is an explicit sortWithinPartitions on those
    * columns. Deriving an ordering claim by induction ("the window
    * sorted upstream and every later operator preserves order") was
    * MEASURED UNFAITHFUL at scale: the 3×/10× TransitSssp grid carried
    * such a claim, the ride window skipped its sort on rows that were
    * not in the claimed order, and routing parity failed with
    * under-propagated (wrong) distances — caught by TimeScale's
    * pregel≡CSR assert, bisected to exactly the ordering half of the
    * pin (COVERAGE.md r11). Partitioning-only claims on the same frames
    * are parity-green; an AQE runtime join/stage choice evidently does
    * not preserve the order the static plan implies, so the induction
    * argument is unsound under AQE. */
  /** CONTRACT (r11 ADVICE): the guard below checks only the backing RDD's
    * partition COUNT plus column existence — it cannot verify the data is
    * actually hash-distributed on `partCols`. A caller passing the wrong
    * columns with a matching count would attach a false claim and silently
    * skip required Exchanges, corrupting joins/aggregates. Production code
    * must therefore go through [[pinnedCheckpoint]], which ARRANGES the
    * claimed layout itself (claim true by construction); call rePin
    * directly only when the checkpointed plan's last layout-affecting
    * operators are literally `repartition(n, partCols)` followed (when
    * sortCols is non-empty) by `sortWithinPartitions(sortCols)`. */
  def rePin(df: Dataset[_], expectedPartitions: Int,
      partCols: Seq[String], sortCols: Seq[String]): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.getNumPartitions == expectedPartitions &&
          partCols.forall(c => lr.output.exists(_.name == c)) &&
          sortCols.forall(c => lr.output.exists(_.name == c)) =>
        val attr = lr.output.map(a => a.name -> a).toMap
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(partCols.map(attr), expectedPartitions)
        val order = sortCols.map(c => org.apache.spark.sql.catalyst
          .expressions.SortOrder(attr(c),
            org.apache.spark.sql.catalyst.expressions.Ascending, Seq.empty))
        val session = df.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        org.apache.spark.sql.classic.Dataset.ofRows(session,
          LogicalRDD(lr.output, lr.rdd, part, order, lr.isStreaming,
            lr.stream)(session))
      case _ => flattenStats(df)
    }

  /** Checkpoint with a layout claim that is TRUE BY CONSTRUCTION: this
    * helper itself arranges `repartition(n, partCols)` (and, when
    * `sortCols` is non-empty, `sortWithinPartitions(sortCols)`) as the
    * LAST operators before the checkpoint, then re-attaches the exact
    * matching metadata via [[rePin]]. A caller cannot mis-state a layout
    * it did not arrange — the misuse mode r11 ADVICE flagged on raw
    * rePin. An explicit-count repartition is never AQE-coalesced, so the
    * count guard always matches and the pin always sticks. `ckpt` is the
    * caller's checkpoint function (it chooses the storage level). */
  def pinnedCheckpoint(df: Dataset[_], n: Int, partCols: Seq[String],
      sortCols: Seq[String], ckpt: DataFrame => DataFrame): DataFrame = {
    require(partCols.nonEmpty, "pinnedCheckpoint needs at least one partition column")
    val base = df.toDF()
    val laid0 = base.repartition(n, partCols.map(base.col): _*)
    val laid =
      if (sortCols.isEmpty) laid0
      else laid0.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    rePin(ckpt(laid), n, partCols, sortCols)
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
