package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder golden over the classic Sennrich vocabulary —
  * merges hand-derived in the comments. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer learns the classic merges; encoder applies them greedily") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "count")
    val merges = Bpe.train(words, 4)
    // round 1 pair counts: e-s 9, s-t 9 (tie → lexicographic), l-o 7, o-w 7,
    // w-e 8, n-e 6, e-w 6, e-r 2, w-i/i-d/d-e 3
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // lowest: l o w e s t → es → est → lo → low ⇒ [low, est]
    // newest: n e w est ⇒ 4 symbols; low ⇒ [low]
    val enc = Seq("lowest", "newest", "low").toDF("w")
      .select(Bpe.subwordCount(col("w"), merges).as("n")).as[Int].collect().toSeq
    assert(enc == Seq(2, 4, 1))
    // greedy adjacency: shared boundaries must not block the next site
    assert(Seq("abab").toDF("w")
      .select(Bpe.subwordCount(col("w"), Seq(("a", "b")))).as[Int].head() == 2)
    assert(Seq("aaa").toDF("w")
      .select(Bpe.subwordCount(col("w"), Seq(("a", "a")))).as[Int].head() == 2)
    // chained merges on repeated material: "aaaa" with (a,a) then (aa,aa)
    assert(Seq("aaaa").toDF("w")
      .select(Bpe.subwordCount(col("w"), Seq(("a", "a"), ("aa", "aa"))))
      .as[Int].head() == 1)
  }

  test("training stops when no pair co-occurs") {
    val words = Seq(("a", 3L), ("b", 2L)).toDF("word", "count")
    assert(Bpe.train(words, 5).isEmpty)
  }
}
