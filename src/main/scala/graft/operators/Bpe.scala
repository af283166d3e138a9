package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich-style byte-pair encoding
  * over a word-frequency table) and merge application.
  *
  * The trainer's working set is the UNIQUE-WORD table with counts — at
  * 100 TB of corpus that is millions of rows, not the corpus itself. A
  * 32k-vocab training is tens of thousands of SEQUENTIAL rounds, so the
  * per-round cost decides everything: below [[LocalTrainMaxWords]] unique
  * words the table is collected ONCE and trained in-heap (each round a
  * hash-map pair count over the array — microseconds, not a Spark job);
  * above it, each round is one distributed pair-count aggregation
  * (map-side combinable) plus a 1-row argmax to the driver. Same gate
  * shape as ShortestPaths.Sssp.isLocal: one map-side count() answers
  * "is it local?" without moving a row, and both branches produce
  * IDENTICAL merges (BpeSpec forces and compares them).
  *
  * Representation: a word is a symbol string with DOUBLE-space separators
  * and single-space ends — `" l  o  w "`. A merge (a, b) is then the plain
  * string replace `" a  b " → " ab "`: each match consumes one boundary
  * space on each side, so adjacent merge sites keep their own boundary and
  * left-to-right non-overlapping replace equals greedy BPE exactly
  * ([a,b,a,b] → [ab, ab]; [a,a,a] → [aa, a]). No regex anywhere, so any
  * SQL engine's `replace` reproduces the application verbatim — the
  * catalog queries `text_bpe_merges` / `text_bpe_encode` hash-check the
  * trainer and the encoder against DuckDB.
  */
object Bpe {

  /** Unique-word threshold for the in-heap trainer: 2M words × ~30 B of
    * symbols ≈ 60 MB driver heap — trivial; above it (web-scale
    * vocabularies) the distributed rounds take over. */
  val LocalTrainMaxWords: Long = 2000000L

  /** "word" → " w  o  r  d " (double-space separators, single-space ends;
    * a trailing extra space is harmless to matching and trimmed before
    * any split). (?s) so line terminators survive — trainLocal's code-point
    * loop keeps them, and branch parity requires both sides see identical
    * symbols. */
  def toSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(?s)(.)", "$1  "))

  /** Symbols of a symbol string (split on the double-space separator). */
  private def symbolsOf(s: Column): Column = split(trim(s), " +")

  /** Apply one merge (a, b) → "ab": plain replace, no regex. */
  def applyMerge(sym: Column, a: String, b: String): Column =
    replace(sym, lit(s" $a  $b "), lit(s" $a$b "))

  /** Train `numMerges` merges over (word, count) rows. Deterministic: ties
    * broken by (left symbol, right symbol) ascending in UTF-8 byte order —
    * Spark's string sort order, which the local branch reproduces exactly;
    * pairs seen only once (weighted count 1) still merge, pairs never
    * co-occurring end training early. Returns merges in application order. */
  def train(words: DataFrame, numMerges: Int,
      localMaxWords: Long = LocalTrainMaxWords): Seq[(String, String)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val w = words.select(col("word").cast("string").as("word"),
      col("count").cast("long").as("count"))
    // Local-vs-distributed pre-gate: a plain parallel count() (per-partition
    // counts combine map-side) — no rows move unless the answer is "local".
    if (w.count() <= math.min(localMaxWords, (Int.MaxValue - 2).toLong))
      trainLocal(w.as[(String, Long)].collect(), numMerges)
    else trainDistributed(w, numMerges)
  }

  /** One distributed round per merge: pair-count aggregation + 1-row argmax.
    * The regime for vocabularies whose unique-word table exceeds driver
    * heap; per-round latency is a full Spark job, so this is only the
    * right branch when the data genuinely doesn't fit. */
  private def trainDistributed(words: DataFrame,
      numMerges: Int): Seq[(String, String)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var syms = words.select(toSymbols(col("word")).as("s"),
      col("count").cast("long").as("count")).cache()
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      val arr = symbolsOf(col("s"))
      val top = syms
        .select(explode(zip_with(
          slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"), col("count"))
        .groupBy("p.a", "p.b").agg(sum("count").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b")).limit(1)
        .as[(String, String, Long)].collect()
      top.headOption match {
        case Some((a, b, _)) =>
          merges += ((a, b))
          val next = syms.select(applyMerge(col("s"), a, b).as("s"),
            col("count")).cache()
          next.count() // materialize before dropping the parent cache
          syms.unpersist()
          syms = next
        case None => exhausted = true // every word is one symbol
      }
      rounds += 1
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Spark orders strings by UTF-8 byte comparison (unsigned), which
    * differs from String.compareTo (UTF-16 code units) above the BMP —
    * the local tie-break must match the distributed sort exactly. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** In-heap trainer: identical merges to the distributed rounds (every
    * adjacent pair occurrence counts, weighted by word count; argmax with
    * (n desc, a asc, b asc) UTF-8 tie-break; greedy left-to-right
    * non-overlapping application). Naive full recount per round — at the
    * ≤2M-word scale this branch admits, a round is milliseconds, so 32k
    * merges finish in minutes where the per-round-Spark-job loop took
    * days. Initial symbols are CODE POINTS, matching regexp "(?s)(.)" on
    * the distributed side. */
  private[operators] def trainLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    val counts = words.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      val pair = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val c = counts(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pair.update(k, pair.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      if (pair.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestN = Long.MinValue
        for ((k, n) <- pair) {
          if (n > bestN || (n == bestN &&
              (utf8Lt(k._1, best._1) ||
                (k._1 == best._1 && utf8Lt(k._2, best._2))))) {
            best = k; bestN = n
          }
        }
        merges += best
        val (a, b) = best
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          if (s.length >= 2) {
            var contains = false
            var i = 0
            while (i < s.length - 1 && !contains) {
              if (s(i) == a && s(i + 1) == b) contains = true
              i += 1
            }
            if (contains) {
              val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
              i = 0
              while (i < s.length) {
                if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                  out += a + b; i += 2
                } else { out += s(i); i += 1 }
              }
              syms(wi) = out.toArray
            }
          }
          wi += 1
        }
      }
      rounds += 1
    }
    merges.toSeq
  }

  /** Sub-word count per word after applying `merges` in order — the same
    * replace chain any SQL engine reproduces verbatim. */
  def subwordCount(word: Column, merges: Seq[(String, String)]): Column = {
    val seq = merges.foldLeft(toSymbols(word)) {
      case (acc, (a, b)) => applyMerge(acc, a, b)
    }
    size(symbolsOf(seq))
  }
}
