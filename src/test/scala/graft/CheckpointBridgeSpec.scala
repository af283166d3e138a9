package graft

import org.apache.spark.sql.graftbridge.CheckpointBridge

/** CheckpointBridge reaches through a localCheckpoint()ed Dataset's plan to
  * unpersist its backing RDD — internals Dataset.unpersist cannot touch.
  * The iterative operators (TransitSssp, pathDistributed, Bpe, Betweenness)
  * rely on it to bound live state to ~two rounds; if a Spark upgrade
  * changes the plan shape a checkpoint bottoms out in, the release would
  * silently become a no-op and long runs would re-grow their checkpoint
  * history — this spec pins the actual storage effect. */
class CheckpointBridgeSpec extends SparkSpec {

  test("releases a checkpoint's backing RDD storage") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = spark.range(1000).toDF("v").localCheckpoint(true)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint(true) should register a persistent RDD")
    CheckpointBridge.unpersistCheckpoint(df)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      "the checkpoint's backing RDD must be unregistered after release")
  }

  test("is a no-op on non-checkpoint frames (and leaves caches alone)") {
    val cached = spark.range(100).toDF("v").cache()
    cached.count()
    val persistent = spark.sparkContext.getPersistentRDDs.size
    CheckpointBridge.unpersistCheckpoint(cached) // plan is not a LogicalRDD
    CheckpointBridge.unpersistCheckpoint(spark.range(10).toDF("v"))
    assert(spark.sparkContext.getPersistentRDDs.size == persistent,
      "non-checkpoint frames must not lose storage")
    cached.unpersist()
  }

  test("a released round's successor stays readable (the operators' contract)") {
    val a = spark.range(100).toDF("v").localCheckpoint(true)
    val b = a.selectExpr("v * 2 as v").localCheckpoint(true) // materialized successor
    CheckpointBridge.unpersistCheckpoint(a)
    assert(b.selectExpr("sum(v)").head.getLong(0) == 9900L)
  }
}
