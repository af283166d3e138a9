package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich-style byte-pair encoding
  * over a word-frequency table) and merge application.
  *
  * The trainer's working set is the UNIQUE-WORD table with counts — at
  * 100 TB of corpus that is millions of rows, not the corpus itself; each
  * of the `numMerges` rounds is one distributed pair-count aggregation
  * (map-side combinable) plus a 1-row argmax to the driver.
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

  /** "word" → " w  o  r  d " (double-space separators, single-space ends;
    * a trailing extra space is harmless to matching and trimmed before
    * any split). */
  def toSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1  "))

  /** Symbols of a symbol string (split on the double-space separator). */
  private def symbolsOf(s: Column): Column = split(trim(s), " +")

  /** Apply one merge (a, b) → "ab": plain replace, no regex. */
  def applyMerge(sym: Column, a: String, b: String): Column =
    replace(sym, lit(s" $a  $b "), lit(s" $a$b "))

  /** Train `numMerges` merges over (word, count) rows. Deterministic: ties
    * broken by (left symbol, right symbol) ascending; pairs seen only once
    * (weighted count 1) still merge, pairs never co-occurring end training
    * early. Returns merges in application order. */
  def train(words: DataFrame, numMerges: Int): Seq[(String, String)] = {
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

  /** Sub-word count per word after applying `merges` in order — the same
    * replace chain any SQL engine reproduces verbatim. */
  def subwordCount(word: Column, merges: Seq[(String, String)]): Column = {
    val seq = merges.foldLeft(toSymbols(word)) {
      case (acc, (a, b)) => applyMerge(acc, a, b)
    }
    size(symbolsOf(seq))
  }
}
