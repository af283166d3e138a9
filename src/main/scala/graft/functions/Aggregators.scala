package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Result/buffer of [[MinItemsAggregator]]: the minimum key seen and EVERY
  * item that attained it (sorted on finish for determinism). */
final case class MinItems(minKey: Long, items: Seq[Long])

/** One-pass tied-arg-min — the `apoc.agg.minItems` analog (SURVEY §2.11's
  * optional custom aggregate). The window `rank() = 1` form (A4) shuffles
  * and SORTS each partition; this typed Aggregator folds each group in
  * O(n) with state bounded by the tie count, and its partial merge is
  * associative so Spark applies it map-side. Same semantics, cheaper at
  * scale when groups are large and ties are few — the catalog query
  * `a4_argmin_onepass` shares A4's DuckDB oracle to prove equivalence. */
final class MinItemsAggregator extends Aggregator[(Long, Long), MinItems, MinItems] {
  override def zero: MinItems = MinItems(Long.MaxValue, Nil)

  override def reduce(b: MinItems, a: (Long, Long)): MinItems =
    if (a._1 < b.minKey) MinItems(a._1, a._2 :: Nil)
    else if (a._1 == b.minKey) MinItems(b.minKey, a._2 +: b.items)
    else b

  override def merge(x: MinItems, y: MinItems): MinItems =
    if (x.minKey < y.minKey) x
    else if (y.minKey < x.minKey) y
    else MinItems(x.minKey, x.items ++ y.items)

  override def finish(r: MinItems): MinItems = MinItems(r.minKey, r.items.sorted)

  override def bufferEncoder: Encoder[MinItems] = Encoders.product[MinItems]
  override def outputEncoder: Encoder[MinItems] = Encoders.product[MinItems]
}
