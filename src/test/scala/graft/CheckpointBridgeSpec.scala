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

  test("flattenStats drops origin statistics but keeps rows and release") {
    import org.apache.spark.sql.functions.col
    val raw = spark.range(1000).toDF("v")
      .repartition(7, col("v")).sortWithinPartitions("v")
    val ck = raw.localCheckpoint(true)
    val flat = CheckpointBridge.flattenStats(ck)
    // rows identical
    assert(flat.count() == 1000L &&
      flat.selectExpr("sum(v)").head.getLong(0) == 499500L)
    // origin stats gone: the flattened leaf reports the session default
    // size, not the checkpointed plan's estimate (the exponent-doubling
    // guard the iterative loops rely on)
    val ckStats = ck.queryExecution.optimizedPlan.stats.sizeInBytes
    val flatStats = flat.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(flatStats > ckStats,
      s"flattened leaf should fall back to the (huge) default size: $flatStats vs $ckStats")
    // and the release path still resolves the backing RDD through the rewrap
    val persistentBefore = spark.sparkContext.getPersistentRDDs.keySet
    CheckpointBridge.unpersistCheckpoint(flat)
    val persistentAfter = spark.sparkContext.getPersistentRDDs.keySet
    assert(persistentAfter.size < persistentBefore.size,
      "unpersistCheckpoint must release through the flattened wrapper")
  }

  test("rePin restores the layout AQE strips from checkpoints (count-guarded)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.LogicalRDD
    val ck = spark.range(1000).toDF("v")
      .repartition(7, col("v")).sortWithinPartitions("v")
      .localCheckpoint(true)
    // under AQE the checkpoint itself reports UnknownPartitioning — the
    // motivating bug: every "pinned" join side silently re-Exchanged
    val lost = ck.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    assert(lost.outputPartitioning.toString.contains("Unknown"),
      s"precondition changed: checkpoint kept ${lost.outputPartitioning} — " +
        "if Spark preserves partitioning under AQE now, rePin may be retired")
    val pinned = CheckpointBridge.rePin(ck, 7, Seq("v"), Seq("v"))
    // rows intact, metadata restored
    assert(pinned.count() == 1000L)
    val lr = pinned.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    assert(lr.outputPartitioning.toString.startsWith("hashpartitioning"),
      s"expected a hash pin, got ${lr.outputPartitioning}")
    assert(lr.outputOrdering.nonEmpty)
    // an aggregation on the pinned key plans WITHOUT an Exchange
    val plan = pinned.groupBy("v").count().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hash(v) pin must satisfy the aggregation; plan:\n$plan")
    // the aggregation is also CORRECT on the restored layout
    assert(pinned.groupBy("v").count().count() == 1000L)
    // count guard: a wrong expected partition count degrades to no pin
    val unpinned = CheckpointBridge.rePin(ck, 8, Seq("v"), Seq("v"))
    assert(unpinned.queryExecution.analyzed.asInstanceOf[LogicalRDD]
      .outputPartitioning.toString.contains("Unknown"),
      "a partition-count mismatch must degrade to the unpinned plan")
  }

  test("pinnedCheckpoint lays out and pins in one step (claim true by construction)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.LogicalRDD
    // the caller hands over an UNARRANGED frame — the helper itself
    // repartitions/sorts before checkpointing, so the attached claim
    // cannot diverge from the data (r11 ADVICE misuse mode on raw rePin)
    val pinned = CheckpointBridge.pinnedCheckpoint(
      spark.range(1000).toDF("v").withColumn("w", col("v") * 2),
      7, Seq("v"), Seq("v"), df => df.localCheckpoint(true))
    val lr = pinned.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    assert(lr.rdd.getNumPartitions == 7)
    assert(lr.outputPartitioning.toString.startsWith("hashpartitioning"),
      s"expected a hash pin, got ${lr.outputPartitioning}")
    assert(lr.outputOrdering.nonEmpty)
    val plan = pinned.groupBy("v").count().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hash(v) pin must satisfy the aggregation; plan:\n$plan")
    assert(pinned.count() == 1000L)
    CheckpointBridge.unpersistCheckpoint(pinned)
  }
}
