package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter sketch surface over Spark's OWN runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*`), exposed as Columns
  * for explicit pipeline use. The intended shape is the decontamination
  * prefilter (`pipeline_contamination_bloom`): build the sketch over the
  * SMALL side (benchmark grams), collect the one binary blob to the driver
  * and embed it as a LITERAL — `BloomFilterMightContain` requires a
  * constant bloom side, and a literal is exactly what ships to every
  * executor in the task binary — then prefilter the 100 TB side at
  * ~ns/row before any join machinery sees it. False positives are removed
  * by the exact verify join that follows, so results stay identical to
  * the unfiltered plan. */
object SketchFunctions {

  /** Aggregate a LONG-hashed column (e.g. `xxhash64(col)`) into a
    * serialized Bloom filter (binary). `expectedItems` sizes the bit
    * array at the expression's default false-positive rate (~3 %) —
    * oversizing only costs bits, never correctness. */
  def bloomAgg(hashed: Column, expectedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed), expectedItems).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter. `bloom` must be
    * CONSTANT (a `lit(bytes)` of a collected sketch); `hashed` must apply
    * the SAME long hash used at build time. May return true for absent
    * values (bounded false-positive rate), never false for present ones —
    * callers keep an exact verify step after the prefilter. */
  def bloomMightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))
}
