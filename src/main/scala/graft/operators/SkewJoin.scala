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

  /** Internal column name guaranteed absent from `cols` — a caller-supplied
    * `__salt` column would otherwise be silently overwritten (and collide
    * in the join key). */
  private def freshName(base: String, cols: Seq[String]): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !cols.contains(n)).get

  /** Deterministic salt in [0, saltFactor). A NULL discriminator would
    * silently collapse every row of a hot key into one bucket (xxhash64
    * skips nulls), defeating the mitigation — fail loudly instead. */
  private def saltExpr(key: String, discriminator: String, saltFactor: Int): Column =
    when(col(discriminator).isNull, raise_error(lit(
      s"SkewJoin: discriminator '$discriminator' is NULL — salt would " +
        "degenerate to one bucket per key; pick a non-null column")))
      .otherwise(pmod(xxhash64(col(key), col(discriminator)), lit(saltFactor)).cast("int"))

  /** Equi-join `large ⋈ small` on `key`, fanning each small-side row out to
    * `saltFactor` replicas and hashing the large side across them. The
    * small side is the dimension (its replication costs saltFactor×|small|);
    * the large side's hot keys spread across saltFactor reducers.
    *
    * `discriminator` picks the large-side column whose hash spreads rows of
    * one key (e.g. a unique id); NULL values raise at execution. */
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
    val salt = freshName("__salt", large.columns.toSeq ++ small.columns.toSeq)
    val saltedLarge = large.withColumn(salt, saltExpr(key, discriminator, saltFactor))
    val saltedSmall = small.withColumn(salt,
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, salt), joinType).drop(salt)
  }

  /** Skew-safe grouped aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. Spark's hash aggregate already does map-side
    * partials, so this matters when the PARTIAL result per key is itself
    * huge (e.g. collect_list) — the two-level tree bounds any single task's
    * state. `partial`/`fin` express the decomposition (sum/sum, count/sum,
    * collect/flatten…). */
  def saltedAgg(df: DataFrame, key: String, discriminator: String,
      saltFactor: Int, partial: Column, fin: Column => Column,
      outName: String): DataFrame = {
    val salt = freshName("__salt", df.columns.toSeq)
    val part = freshName("__partial", df.columns.toSeq)
    df.withColumn(salt, saltExpr(key, discriminator, saltFactor))
      .groupBy(col(key), col(salt))
      .agg(partial.as(part))
      .groupBy(col(key))
      .agg(fin(col(part)).as(outName))
  }
}
