package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.graph.ShortestPaths
import graft.etl.{GtfsLoader, GraphBuilder}
import graft.functions.SpatialFunctions._
import graft.functions.TextFunctions._

/** Property-based checks (SURVEY §5.2): randomized graphs against the local
  * Dijkstra oracle, haversine metric laws, derived-edge invariants. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, s"$name: $res")
  }

  test("Pregel SSSP equals local Dijkstra on random weighted digraphs") {
    val genGraph = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 1L)
        d <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(1, 100)
      } yield (s, d, w.toDouble))
    } yield edges.distinct
    val prop = Prop.forAll(genGraph) { edges =>
      edges.nonEmpty ==> {
        val df = edges.toDF("src", "dst", "weight")
        val src = edges.head._1
        val pregel = ShortestPaths.fromDF(df, Set(src), localThreshold = 0)
          .select("vertex_id", "dist").as[(Long, Double)].collect().toMap
        val local = ShortestPaths.fromDF(df, Set(src))
          .select("vertex_id", "dist").as[(Long, Double)].collect().toMap
        pregel == local
      }
    }
    check("sssp-oracle", prop, minTests = 15)
  }

  test("negative-weight DAGs: in-heap SPFA equals Pregel, preds included (r15)") {
    // Random DAGs (edges only i→j with i<j, so no cycles of any sign)
    // with weights spanning negative values — the class the r15 dispatch
    // routes to the label-correcting fixpoint, where settle-once Dijkstra
    // would be silently wrong. Parity must hold on dist AND pred (the
    // canonical min-index tie-break), across the local and Pregel regimes.
    val genGraph = for {
      n <- Gen.choose(3, 12)
      m <- Gen.choose(2, 30)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 2L)
        dOff <- Gen.choose(1L, n - 1L)
        w <- Gen.choose(-5, 12)
      } yield (s, math.min(s + dOff, n - 1L), w.toDouble))
      // dst > src always (s <= n-2, dOff >= 1) — acyclic by construction
    } yield edges.distinct
    val prop = Prop.forAll(genGraph) { edges =>
      edges.nonEmpty ==> {
        val df = edges.toDF("src", "dst", "weight")
        val src = edges.map(_._1).min
        def key(t: Long) = ShortestPaths.fromDF(df, Set(src),
          localThreshold = t)
          .select("vertex_id", "dist", "pred")
          .as[(Long, Double, Long)].collect().toSet
        key(Long.MaxValue) == key(0L)
      }
    }
    check("spfa-pregel-parity", prop, minTests = 15)
  }

  test("target-bounded Dijkstra equals the full run on requested targets") {
    // runForTargets stops each source's search once every in-graph target
    // settles (r10) — target distances, preds, and reconstructed paths
    // must be indistinguishable from the unbounded run, including
    // unreachable and absent targets.
    val genCase = for {
      n <- Gen.choose(3, 14)
      m <- Gen.choose(2, 40)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 1L)
        d <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(1, 50)
      } yield (s, d, w.toDouble))
      targets <- Gen.nonEmptyListOf(Gen.choose(0L, n + 2L)) // incl. absent ids
    } yield (edges.distinct, targets.distinct)
    val prop = Prop.forAll(genCase) { case (edges, targets) =>
      edges.nonEmpty ==> {
        val df = edges.toDF("src", "dst", "weight")
        val sssp = new ShortestPaths.Sssp(df)
        val src = edges.head._1
        val bounded = sssp.runForTargets(Set(src), targets.toSet)
        val full = sssp.run(Set(src))
          .select("vertex_id", "dist").as[(Long, Double)].collect().toMap
        val distsOk = targets.forall { t =>
          bounded.distance(src, t) == full.get(t).filterNot(_.isInfinity)
        }
        // every reachable target's path must telescope to its distance
        val pathsOk = targets.filter(t => full.get(t).exists(!_.isInfinity))
          .forall { t =>
            val p = bounded.path(src, t)
            p.headOption.contains(src) && p.lastOption.contains(t) || (t == src)
          }
        distsOk && pathsOk
      }
    }
    check("sssp-target-bounded", prop, minTests = 20)
  }

  test("haversine: symmetry, identity, triangle inequality") {
    val genPt = for {
      lat <- Gen.choose(-85.0, 85.0)
      lon <- Gen.choose(-180.0, 180.0)
    } yield (lat, lon)
    val prop = Prop.forAll(genPt, genPt, genPt) { (a, b, c) =>
      val df = Seq((a._1, a._2, b._1, b._2, c._1, c._2))
        .toDF("la", "qa", "lb", "qb", "lc", "qc")
      val r = df.select(
        haversineMeters($"la", $"qa", $"lb", $"qb"),
        haversineMeters($"lb", $"qb", $"la", $"qa"),
        haversineMeters($"la", $"qa", $"la", $"qa"),
        haversineMeters($"la", $"qa", $"lc", $"qc"),
        haversineMeters($"lc", $"qc", $"lb", $"qb")).head
      val (ab, ba, aa, ac, cb) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      ab == ba && aa == 0.0 && ab >= 0.0 && ab <= ac + cb + 1e-6
    }
    check("haversine-metric", prop)
  }

  test("jaccardSorted equals set-computed Jaccard") {
    val genSets = for {
      a <- Gen.listOf(Gen.choose(0L, 30L))
      b <- Gen.listOf(Gen.choose(0L, 30L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val prop = Prop.forAll(genSets) { case (a, b) =>
      (a.nonEmpty || b.nonEmpty) ==> {
        val got = Seq((a, b)).toDF("a", "b")
          .select(jaccardSorted($"a", $"b")).as[Double].head()
        val inter = a.toSet.intersect(b.toSet).size.toDouble
        val union = a.toSet.union(b.toSet).size.toDouble
        got == (if (union == 0) 1.0 else inter / union)
      }
    }
    check("jaccard", prop)
  }

  test("derived-edge invariants on the fixture") {
    val gtfs = GtfsLoader.load(spark, fixtureDir)
    // PRECEDES count per trip = stoptime rows − 1
    val perTrip = gtfs.stopTimes.groupBy("trip_id").count()
      .withColumnRenamed("count", "rows")
    val precedes = GraphBuilder.precedes(gtfs.stopTimes)
      .groupBy("trip_id").count()
    val joined = perTrip.join(precedes, Seq("trip_id"))
      .filter(col("count") =!= col("rows") - 1)
    assert(joined.count() == 0)
    // WALK_TO is symmetric and reflexive on every stop
    val w = GraphBuilder.walkTo(gtfs.stops)
    val asym = w.select(col("src_stop_id").as("a"), col("dst_stop_id").as("b"))
      .except(w.select(col("dst_stop_id").as("a"), col("src_stop_id").as("b")))
    assert(asym.count() == 0)
    assert(w.filter(col("src_stop_id") === col("dst_stop_id")).count() ==
      gtfs.stops.count())
  }

  test("sequence packing invariants hold on random shards") {
    import graft.operators.SequencePacking
    val cap = 256L
    val genDocs = Gen.listOf(for {
      id <- Gen.choose(0L, 500L)
      n <- Gen.choose(1L, 300L) // includes oversize docs (> cap)
    } yield (id, n)).map(_.distinctBy(_._1))
    val prop = Prop.forAll(genDocs) { docs =>
      docs.nonEmpty ==> {
        val packed = SequencePacking.packShard(docs, cap)
        val byBin = packed.groupBy(_._1)
        // every bin within budget unless it holds a single oversize doc
        val budgetOk = byBin.forall { case (_, rows) =>
          rows.map(_._3).sum <= cap || rows.size == 1 }
        // no doc lost or duplicated
        val complete = packed.map(_._2).toSet == docs.map(_._1).toSet &&
          packed.size == docs.size
        // bins are nondecreasing in doc order and contiguous from 0
        val order = packed.map(_._1)
        val monotone = order == order.sorted
        val contiguous = order.distinct == (0L until byBin.size.toLong)
        // greedy: a doc never starts a new bin the previous bin had room for
        val greedy = packed.sliding(2).forall {
          case Seq((b1, _, _), (b2, _, n2)) if b2 == b1 + 1 =>
            byBin(b1).map(_._3).sum + n2 > cap
          case _ => true
        }
        budgetOk && complete && monotone && contiguous && greedy
      }
    }
    check("packing invariants", prop)
    // distributed form == driver fold, shard by shard
    val docs = Seq((0L, 10L, 100L), (0L, 11L, 200L), (0L, 12L, 250L),
      (1L, 20L, 300L), (1L, 21L, 5L), (2L, 30L, 256L))
    val distributed = SequencePacking.pack(docs.toDS(), cap)
      .as[(Long, Long, Long, Long)].collect().toSet
    val reference = docs.groupBy(_._1).flatMap { case (shard, rows) =>
      SequencePacking.packShard(rows.map(t => (t._2, t._3)), cap)
        .map { case (bin, id, n) => (shard, bin, id, n) }
    }.toSet
    assert(distributed == reference)
  }

  test("bloom sketch: no false negatives; prefiltered contamination equals exact (r15)") {
    import graft.functions.SketchFunctions._
    // membership law: every inserted value probes TRUE (false negatives
    // are impossible by construction); absent values may probe true but
    // the rate is bounded — assert well under 50 % at the sized capacity
    val present = (1L to 500L).map(i => s"gram-$i")
    val absent = (1L to 500L).map(i => s"other-$i")
    val bloom = present.toDF("g")
      .agg(bloomAgg(xxhash64($"g"), 10000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe = (present.map((_, true)) ++ absent.map((_, false)))
      .toDF("g", "inserted")
      .select($"inserted",
        bloomMightContain(lit(bloom), xxhash64($"g")).as("hit"))
      .as[(Boolean, Boolean)].collect()
    assert(probe.filter(_._1).forall(_._2), "false negative in bloom probe")
    val fp = probe.filterNot(_._1).count(_._2)
    assert(fp < 250, s"implausible false-positive count: $fp/500")
    // end-to-end: the bloom-prefiltered contamination row must return
    // EXACTLY the exact row's result (the verify join removes the sketch's
    // false positives) — same guarantee the shared oracle checks at sf0.01
    val sf = "/root/testdata/sf0.001"
    def rows(name: String) = graft.queries.Catalog.all.find(_.name == name).get
      .run(spark, sf).as[(Long, Long)].collect().toSeq
    assert(rows("pipeline_contamination_bloom") == rows("pipeline_contamination"))
  }

  test("minhash similarity estimates correlate with true Jaccard") {
    // identical sets → identical signatures; disjoint sets → (near) disjoint
    val a = (1L to 40L).toArray
    val b = (1L to 40L).toArray
    val c = (100L to 140L).toArray
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("id", "sh")
      .select($"id", minhashSignature($"sh", 32).as("sig"))
    val sigs = df.as[(String, Seq[Long])].collect().toMap
    assert(sigs("a") == sigs("b"))
    val agree = sigs("a").zip(sigs("c")).count { case (x, y) => x == y }
    assert(agree <= 3) // true J = 0 → expected agreement ~0
  }
}
