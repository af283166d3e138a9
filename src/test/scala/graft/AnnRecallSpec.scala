package graft

/** Recall floors for the approximate-nearest-neighbor operators against the
  * brute-force ground truth. Approximate operators can return full-looking
  * result sets that share nothing with the true neighbors (the 6-plane LSH
  * configuration did exactly that) — row counts and schemas can't catch it,
  * recall can. */
class AnnRecallSpec extends SparkSpec {

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("v_id")).toSet).toMap

  test("IVF and LSH ANN keep usable recall@10 vs brute force") {
    val truth = topk("sim_topk_bruteforce")
    val ivf = topk("sim_ann_ivf")
    val lsh = topk("sim_ann_lsh")
    def meanRecall(approx: Map[Long, Set[Long]]): Double =
      truth.keys.map(q => truth(q).intersect(approx.getOrElse(q, Set.empty)).size / 10.0)
        .sum / truth.size
    val rIvf = meanRecall(ivf)
    val rLsh = meanRecall(lsh)
    info(f"mean recall@10: IVF $rIvf%.2f, LSH $rLsh%.2f")
    // floors tuned for this near-orthogonal synthetic corpus — real
    // embedding corpora sit far higher; 0 would mean a broken index
    assert(rIvf >= 0.2, s"IVF recall collapsed: $rIvf")
    assert(rLsh >= 0.1, s"LSH recall collapsed: $rLsh")
  }

  test("int8-quantized LSH re-rank: scores faithful, ranking overlaps") {
    // This corpus is near-orthogonal: rank gaps at the top-10 boundary
    // (~0.005) sit BELOW int8's score error (~0.01), so membership churn is
    // expected — the meaningful contracts are (a) quantized scores within
    // tolerance of exact on every shared pair, (b) overlap clearly above
    // chance (10 of ~240 bucket-mates ≈ 0.04).
    def scored(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("v_id")) ->
          r.getAs[Double]("cos")).toMap
    val exact = scored("sim_ann_lsh")
    val quant = scored("sim_ann_lsh_int8")
    val shared = exact.keySet.intersect(quant.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(exact(k) - quant(k)) <= 0.02,
        s"pair $k: exact ${exact(k)} quant ${quant(k)}")
    }
    val overlap = shared.size.toDouble / exact.size
    info(f"int8-vs-exact top-10 overlap: $overlap%.2f (chance ≈ 0.04)")
    assert(overlap >= 0.2, s"quantized ranking diverged to chance: $overlap")
  }
}
