package graft

import org.apache.spark.sql.functions._
import graft.functions.SpatialFunctions._
import graft.functions.TimeFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("haversine matches known geodesic distances within tolerance") {
    // Paris Notre-Dame → London Big Ben ≈ 343.07 km (great-circle, R=6371 km)
    val df = Seq((48.8530, 2.3499, 51.5007, -0.1246)).toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(haversineMeters($"lat1", $"lon1", $"lat2", $"lon2")).head.getDouble(0)
    assert(math.abs(d - 343069.15) < 10, s"got $d")
    // zero distance
    val z = Seq((44.6, 10.9, 44.6, 10.9)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(haversineMeters($"lat1", $"lon1", $"lat2", $"lon2")).head.getDouble(0)
    assert(z == 0.0)
  }

  test("seconds-since-midnight codec handles GTFS times past 24:00:00") {
    val df = Seq("00:00:00", "14:01:30", "24:05:00", "25:10:09").toDF("t")
    val got = df.select(secondsSinceMidnight($"t")).as[Int].collect().toSeq
    assert(got == Seq(0, 14 * 3600 + 90, 24 * 3600 + 300, 25 * 3600 + 609))
    assert(parseHms("25:10:09") == 25 * 3600 + 609)
    assert(formatHms(24 * 3600 + 300) == "24:05:00")
  }

  test("tokenizer, shingles, fingerprint are deterministic and order-sensitive") {
    val df = Seq("the quick brown fox", "the quick  brown fox", "fox brown quick the")
      .toDF("text")
    val toks = df.select(size(tokens($"text"))).as[Int].collect().toSeq
    assert(toks == Seq(4, 4, 4)) // double space collapsed by \s+ split
    val fps = df.select(fingerprint($"text")).as[Long].collect().toSeq
    assert(fps(0) == fps(1)) // same tokens → same fingerprint
    assert(fps(0) != fps(2)) // reordered → different
    val sh = df.select(shingles($"text", 2)).as[Seq[String]].head
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
  }

  test("minhash signatures of identical shingle sets are identical") {
    val df = Seq("a b c d e", "a b c d e", "v w x y z").toDF("text")
      .select(minhashSignature(array_distinct(shingles($"text", 2)), 8).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash: near-identical docs have small hamming distance, different docs large") {
    val docs = Seq(
      ("a", "spark window join filter group sort merge stream batch table row key value"),
      ("b", "spark window join filter group sort merge stream batch table row key data"),
      ("c", "entirely unrelated words concerning butterflies meadows rivers and mountains"))
      .toDF("id", "text").select($"id", simhash64($"text").as("sh"))
    val m = docs.as[(String, Long)].collect().toMap
    val close = java.lang.Long.bitCount(m("a") ^ m("b"))
    val far = java.lang.Long.bitCount(m("a") ^ m("c"))
    assert(close < far, s"close=$close far=$far")
    assert(close <= 16)
  }

  test("md5-portable kernels match driver-side references") {
    // simhashMd5: per-token u64 = first 8 bytes of md5, per-bit majority vote
    def md5u64(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xFFL))
    }
    val toks = Seq("hello", "world", "foo")
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = md5u64(t)
      (0 until 64).foreach(b => votes(b) += (((h >>> b) & 1L).toInt * 2) - 1)
    }
    val expected = (0 until 64).foldLeft(0L)((acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc)
    val got = Seq("hello world foo").toDF("text")
      .select(simhashMd5($"text")).as[Long].head()
    assert(got == expected)
    // minhashMd5: element j is the lexicographic min of md5(s"$j:$hex")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val hexes = Seq("a b", "b c", "c d").map(md5hex).sorted
    val expSig = (0 until 4).map(j => hexes.map(h => md5hex(s"$j:$h")).min)
    val gotSig = Seq("a b c d").toDF("text")
      .select(minhashMd5(md5Shingles($"text", 2), 4)).as[Seq[String]].head()
    assert(gotSig == expSig)
    // empty text: simhash 0, shingle set = [md5("")]
    val empty = Seq("").toDF("text")
      .select(simhashMd5($"text"), md5Shingles($"text", 2)).head()
    assert(empty.getLong(0) == 0L)
    assert(empty.getSeq[String](1) == Seq(md5hex("")))
  }

  test("native md5 kernels equal their compositional Column forms") {
    // the native single-pass rewrites must match the pure-Column
    // formulations they replaced, on varied shapes (empty, short, repeated
    // tokens, punctuation, unicode)
    val texts = Seq("", "one", "a b", "a b c d e f g", "x x x x",
      "Hello, wörld! Ünïcode 123", "the quick brown fox jumps over the lazy dog")
    val df = texts.toDF("text")
    for (n <- Seq(2, 3)) {
      val composed = df.select(
        sort_array(array_distinct(transform(shingles($"text", n),
          s => md5(s.cast("binary"))))).as("sh"))
        .as[Seq[String]].collect().toSeq
      val native = df.select(md5Shingles($"text", n)).as[Seq[String]].collect().toSeq
      assert(native == composed, s"md5Shingles n=$n")
    }
    val sig = md5Shingles($"text", 2)
    val composedBands = df.select(
      transform(sequence(lit(0), lit(3)), b => struct(b.as("band"),
        md5(concat_ws(",", slice(minhashMd5(sig, 8), b * 2 + 1, lit(2)))
          .cast("binary")).as("key"))).as("bk"))
      .as[Seq[(Int, String)]].collect().toSeq
    val nativeBands = df.select(lshBandKeysMd5(minhashMd5(sig, 8), 4, 2))
      .as[Seq[(Int, String)]].collect().toSeq
    assert(nativeBands == composedBands)
    // merge-pass Jaccard == set-algebra Jaccard on sorted distinct arrays
    val pairs = Seq(("a b c d", "b c d e"), ("a b", "a b"), ("a b", "x y"), ("", ""))
      .toDF("t1", "t2")
    val mergeJ = pairs.select(jaccardSets(md5Shingles($"t1", 2), md5Shingles($"t2", 2)))
      .as[Double].collect().toSeq
    val setJ = pairs.select(
      size(array_intersect(md5Shingles($"t1", 2), md5Shingles($"t2", 2))).cast("double") /
        size(array_union(md5Shingles($"t1", 2), md5Shingles($"t2", 2))).cast("double"))
      .as[Double].collect().toSeq
    // empty∩empty: merge-pass defines 1.0, set-algebra 0/0 = NaN — compare
    // the defined ones and pin the convention explicitly
    mergeJ.zip(setJ).foreach { case (m, s2) => if (!s2.isNaN) assert(m == s2) }
    assert(mergeJ.last == 1.0)
    // 60-bit compaction: Jaccard over md5Prefix60 sets equals the
    // string-set Jaccard (no prefix collisions on these fixtures), and the
    // compacted values are the numeric reading of each prefix's 15 hex
    // chars, sorted — the exact DuckDB ('0x'||h[1:15])::BIGINT mirror.
    val compactJ = pairs.select(jaccardSorted(
      md5Prefix60(md5Shingles($"t1", 2)), md5Prefix60(md5Shingles($"t2", 2))))
      .as[Double].collect().toSeq
    assert(compactJ == mergeJ)
    val (hexSets, longSets) = df
      .select(md5Shingles($"text", 2).as("sh"), md5Prefix60(md5Shingles($"text", 2)).as("s6"))
      .as[(Seq[String], Seq[Long])].collect().toSeq.unzip
    hexSets.zip(longSets).foreach { case (hx, ls) =>
      val expect = hx.map(h => java.lang.Long.parseLong(h.take(15), 16)).distinct.sorted
      assert(ls == expect)
    }
  }

  test("withinRadius: bbox conjuncts reach the parquet scan and never clip") {
    // the derived lat/lon bounds must land in the scan's PushedFilters —
    // the row-group-pruning contract that makes the predicate 100 TB-safe
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_bbox_pts").getAbsolutePath
    (1 to 2000).map(i => (i, (i % 171) - 85.0 + 0.1, (i % 353) - 176.0 + 0.2))
      .toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    // default maxMetadataStringLength elides PushedFilters after ~100 chars
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan = pts.filter(withinRadius($"lat", $"lon", 40.0, 10.0, 300000.0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(lat") &&
      plan.contains("LessThanOrEqual(lat"), s"no lat bounds pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(lon") &&
      plan.contains("LessThanOrEqual(lon"), s"no lon bounds pushed:\n$plan")
    // superset correctness on adversarial centers: poles (lon margin
    // degenerates), antimeridian (box would wrap), and mid-latitudes —
    // the boxed predicate must return EXACTLY the plain-haversine rows
    val cases = Seq(
      (88.5, 0.0, 500000.0), (-88.5, 170.0, 800000.0), // pole fallback
      (45.0, 179.8, 300000.0), (0.0, -179.9, 150000.0), // antimeridian
      (40.0, 10.0, 10000.0), (40.0, 10.0, 3000000.0), (-33.9, 18.4, 450000.0))
    for ((lat0, lon0, r) <- cases) {
      val boxed = pts.filter(withinRadius($"lat", $"lon", lat0, lon0, r))
        .select("id").as[Int].collect().toSet
      val plain = pts.filter(
          haversineMeters($"lat", $"lon", lit(lat0), lit(lon0)) < r)
        .select("id").as[Int].collect().toSet
      assert(boxed == plain, s"clipped at ($lat0, $lon0, $r)")
    }
  }

  test("lsh band keys fail loudly when bands*rows exceeds the signature length") {
    // bands past the end of a short signature used to silently hash empty
    // input (md5("") keys bucketing every short row together); now it's an
    // error, matching SkewJoin's fail-loud NULL-discriminator convention
    val df = Seq("a b c d").toDF("text")
    val e = intercept[Exception] {
      df.select(lshBandKeysMd5(minhashMd5(md5Shingles($"text", 2), 8), 5, 2)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds signature length")))
    // exact fit (bands*rows == k) still works
    assert(df.select(lshBandKeysMd5(minhashMd5(md5Shingles($"text", 2), 8), 4, 2))
      .as[Seq[(Int, String)]].head().size == 4)
  }

  test("cosine similarity: orthogonal=0, identical=1") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)))
      .toDF("a", "b")
    val got = df.select(cosine($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq("the cat and the dog of the house",
      "el perro y el gato de la casa en la calle",
      "qwerty zxcvb asdfgh").toDF("text")
    val got = df.select(langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("int8 quantization: dot within 2% of exact on unit vectors, zero-safe") {
    val rng = new scala.util.Random(11)
    val vecs = Seq.fill(6)(Array.fill(64)(rng.nextGaussian()))
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val df = rows.toDF("id", "v")
      .withColumn("u", unitVector(col("v")))
      .withColumn("qu", quantizeInt8(col("u")))
    val a = df.select(col("id").as("ia"), col("u").as("ua"), col("qu").as("qa"))
    val b = df.select(col("id").as("ib"), col("u").as("ub"), col("qu").as("qb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(dot(col("ua"), col("ub")).as("exact"),
        quantizedDot(col("qa"), col("qb")).as("approx"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (ex, ap) =>
      assert(math.abs(ex - ap) <= 0.02, s"exact $ex approx $ap")
    }
    // all-zero vector quantizes to scale 0 and dots to 0 without dividing
    val z = Seq((0L, Seq.fill(8)(0.0))).toDF("id", "v")
      .select(quantizeInt8(col("v")).as("q"))
    val zz = z.crossJoin(z.select(col("q").as("q2")))
      .select(quantizedDot(col("q"), col("q2"))).head.getDouble(0)
    assert(zz == 0.0)
  }

  test("repetition_stats: hand-computed gram counts, short-doc collapse") {
    import graft.functions.expressions.RepetitionStatsExpr
    def st(text: String): (Int, Long, Long, Long, Long) =
      Seq(text).toDF("text")
        .select(RepetitionStatsExpr(graft.functions.TextFunctions.tokens(col("text"))).as("s"))
        .select("s.n_distinct", "s.big_top", "s.big_total", "s.tri_dup", "s.tri_total")
        .as[(Int, Long, Long, Long, Long)].head()
    // "a b a b c": bigrams [a b]×2 [b a] [b c] → top 2 of 4;
    // trigrams [a b a][b a b][a b c] all unique → dup 0 of 3; distinct 3
    assert(st("a b a b c") == ((3, 2L, 4L, 0L, 3L)))
    // "a a a a": trigrams [a a a]×2 → every trigram duplicated
    assert(st("a a a a") == ((1, 3L, 3L, 2L, 2L)))
    // single token: both gram sizes collapse to one whole-text gram
    assert(st("solo") == ((1, 1L, 1L, 0L, 1L)))
  }
}
