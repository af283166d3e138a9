package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Greedy fixed-budget sequence packing — the pretraining
  * batch-construction fold: documents in corpus order are packed into bins
  * of at most `cap` tokens; a document that would overflow a non-empty bin
  * starts the next one (an oversize document owns its bin). Packing is per
  * SHARD, so a 100 TB corpus packs embarrassingly parallel — one shard per
  * worker, no cross-shard coordination — exactly how production pipelines
  * shard packing. The per-shard fold is arbitrary sequential state, the
  * same regime as EventStreams.sessionizeBatchUs; the catalog query
  * `pipeline_pack_sequences` hash-checks it against a recursive-CTE
  * derivation. */
object SequencePacking {

  /** Pure per-shard fold: (docId, nTokens) packed in ascending docId order.
    * Returns (bin, docId, nTokens) in the same order. */
  def packShard(docs: Seq[(Long, Long)], cap: Long): Seq[(Long, Long, Long)] = {
    var bin = 0L
    var fill = 0L
    docs.sortBy(_._1).map { case (docId, n) =>
      if (fill + n > cap && fill > 0) { bin += 1; fill = 0 }
      fill += n
      (bin, docId, n)
    }
  }

  /** Distributed form over (shard, docId, nTokens) rows →
    * (shard, bin, doc_id, n_tokens); each shard's group fits one worker's
    * memory (the bounded-shard regime — choose the shard count so it does). */
  def pack(counts: Dataset[(Long, Long, Long)], cap: Long): DataFrame = {
    import counts.sparkSession.implicits._
    counts.groupByKey(_._1).flatMapGroups { (shard, it) =>
      packShard(it.map(t => (t._2, t._3)).toSeq, cap)
        .iterator.map { case (bin, docId, n) => (shard, bin, docId, n) }
    }.toDF("shard", "bin", "doc_id", "n_tokens")
  }
}
