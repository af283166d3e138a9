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
}
