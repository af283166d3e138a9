package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting, shingling.
  * All pure Column expressions (codegen-friendly; no UDFs) so they survive
  * whole-stage codegen at 100 TB scale.
  */
object TextFunctions {

  /** Whitespace tokenizer (drops empty tokens). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish sub-word tokenizer: letter runs, digit runs, and single
    * punctuation marks each become a token — a cheap deterministic proxy for
    * byte-pair encoding used for token counting. */
  def bpeishTokens(text: Column): Column =
    filter(split(lower(text), "(?<=[a-z])(?=[^a-z])|(?<=[0-9])(?=[^0-9])|(?<=[^a-z0-9])"),
      t => length(trim(t)) > 0)

  /** Token count under the whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny, deterministic, public-knowledge lists. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"),
  )

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val lit_ = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lit_, lower(t))))
  }

  /** Language-ID heuristic: pick the language whose stopword list scores the
    * most hits; ties and zero hits fall back to "und" (undetermined).
    * Deterministic tie-break: language codes in lexicographic order win. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (code, words) =>
      struct(stopwordHits(toks, words).as("hits"), lit(code).as("code"))
    }
    // array_max over (hits, negated-lexicographic code) would invert codes;
    // instead reduce pairwise keeping the first max (lexicographic win on tie).
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Quality-score components: character count, token count, mean token
    * length, punctuation ratio, stopword ratio (English list). Returns a
    * struct; callers pick fields or combine into a single score. */
  def qualityStats(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val toksLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:]", ""))
    val stops = stopwordHits(toks, stopwords("en"))
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      (toksLen.cast("double") / nToks.cast("double")).as("mean_token_len"),
      (punct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      (stops.cast("double") / nToks.cast("double")).as("stopword_ratio"),
    )
  }

  /** Rolling fingerprint over whitespace tokens (rotate-left-5 XOR of
    * per-token xxhash64 — bitwise, so it wraps safely under ANSI mode) —
    * order-sensitive document fingerprint; equal documents get equal
    * fingerprints, reordered ones don't. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(xxhash64(t)))

  /** Word n-gram shingles of size n (space-joined), for MinHash/Jaccard. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** MinHash signature: k minimums of seeded xxhash64 over the shingle set.
    * Deterministic (seed = hash-function index). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** LSH band keys from a MinHash signature: `bands` hashes over consecutive
    * rows of the signature. Docs sharing any band key are near-dup candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(concat_ws(",",
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))).as("key")))

  /** 64-bit SimHash over whitespace tokens: per-bit vote of each token's
    * xxhash64; bit set iff the weighted vote is positive. Pure expressions. */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, h) => zip_with(acc, array((0 until 64).map(b => ((shiftright(h, b)
        .bitwiseAND(1L)) * 2 - 1).cast("int")): _*), (a, v) => a + v))
    (0 until 64).map(b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
