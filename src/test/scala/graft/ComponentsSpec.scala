package graft

import graft.graph.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("local union-find equals distributed GraphX components") {
    val rng = new scala.util.Random(13)
    val edges = Seq.fill(60)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val df = edges.toDF("src", "dst")
    val local = Components.connected(df).as[(Long, Long)].collect().toMap
    val dist = Components.connected(df, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    // component labels are min ids
    assert(local.forall { case (v, c) => c <= v })
  }

  test("isolated pair and chain get the right min-id components") {
    val df = Seq((5L, 6L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val local = Components.connected(df).as[(Long, Long)].collect().toMap
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }
}
