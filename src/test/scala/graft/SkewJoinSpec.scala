package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // skewed fact table: key 1 holds 80% of rows
  private def fact() = (1 to 1000).map { i =>
    (if (i <= 800) 1L else (i % 7).toLong + 2L, i.toLong, i * 1.5)
  }.toDF("k", "id", "v")

  private def dim() = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "label")

  test("salted join equals the plain join bit for bit") {
    val plain = fact().join(dim(), Seq("k"))
      .select("k", "id", "v", "label").orderBy("id").collect().toSeq
    val salted = SkewJoin.saltedJoin(fact(), dim(), "k", "id", saltFactor = 8)
      .select("k", "id", "v", "label").orderBy("id").collect().toSeq
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salted join spreads the hot key across salt buckets") {
    val salts = fact().filter(col("k") === 1L)
      .withColumn("__salt", pmod(xxhash64(col("k"), col("id")), lit(8)).cast("int"))
      .select("__salt").distinct().as[Int].collect().toSet
    assert(salts.size > 4, s"hot key landed in only $salts")
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = fact().groupBy("k").agg(sum("v").as("total"))
      .orderBy("k").as[(Long, Double)].collect().toSeq
    val salted = SkewJoin.saltedAgg(fact(), "k", "id", saltFactor = 8,
        partial = sum("v"), fin = c => sum(c), outName = "total")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    // integer-valued halves summed in any order are FP-exact here; compare
    // with a tolerance anyway to keep the test honest about double sums
    assert(plain.map(_._1) == salted.map(_._1))
    plain.zip(salted).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(a)))
    }
  }

  test("pre-existing __salt column survives and does not collide") {
    val f = fact().withColumn("__salt", lit("caller-owned"))
    val d = dim()
    val out = SkewJoin.saltedJoin(f, d, "k", "id", saltFactor = 4)
      .orderBy("id").collect().toSeq
    assert(out.size == 1000)
    assert(out.head.getAs[String]("__salt") == "caller-owned")
  }

  test("NULL discriminator fails loudly instead of collapsing to one bucket") {
    val f = fact().withColumn("id", when(col("id") === 500L, lit(null)).otherwise(col("id")))
    val ex = intercept[Exception] {
      SkewJoin.saltedJoin(f, dim(), "k", "id").count()
    }
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(causes(ex).exists(m => m != null && m.contains("discriminator")), ex.toString)
  }
}
