package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for hot keys.
  *
  * A shuffle join sends every row of one key to one reducer; at 100 TB a
  * hot key (the city-center stop, the empty-document digest) turns one task
  * into the whole job's tail. AQE's skew-join split handles sort-merge
  * spills adaptively; salting is the plan-level fix that also works for
  * aggregations and stays deterministic. Both sides stay DataFrames —
  * result is bit-identical to the unsalted join.
  *
  * Salt derivation is hash-based (xxhash64 of the whole large-side row's
  * key + a deterministic discriminator column), never rand(): retries and
  * speculative tasks must re-derive the same salt.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, fanning each small-side row out to
    * `saltFactor` replicas and hashing the large side across them. The
    * small side is the dimension (its replication costs saltFactor×|small|);
    * the large side's hot keys spread across saltFactor reducers.
    *
    * `discriminator` picks the large-side column whose hash spreads rows of
    * one key (e.g. a unique id); it must be non-null. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      discriminator: String, saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit one null-extended row per UNMATCHED SALT
    // REPLICA of a small-side row (saltFactor garbage rows per key) — only
    // join types that never null-extend the replicated side are salt-safe
    val safe = Set("inner", "left", "left_outer", "leftouter", "cross")
    require(safe.contains(joinType.toLowerCase.replace("_", "")) ||
      safe.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/cross, not $joinType: outer sides " +
        "that null-extend the replicated small side produce spurious rows")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(col(key), col(discriminator)), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe grouped aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. Spark's hash aggregate already does map-side
    * partials, so this matters when the PARTIAL result per key is itself
    * huge (e.g. collect_list) — the two-level tree bounds any single task's
    * state. `partial`/`fin` express the decomposition (sum/sum, count/sum,
    * collect/flatten…). */
  def saltedAgg(df: DataFrame, key: String, discriminator: String,
      saltFactor: Int, partial: Column, fin: Column => Column,
      outName: String): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), col(discriminator)), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.as("__partial"))
      .groupBy(col(key))
      .agg(fin(col("__partial")).as(outName))
}
