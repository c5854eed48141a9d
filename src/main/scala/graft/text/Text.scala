package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language ID, fingerprinting. All pure
 * Catalyst column expressions (codegen'd, no UDFs), designed so every op has
 * an exact ANSI-SQL equivalent runnable by an external oracle engine.
 *
 * Hashing note: Spark's `xxhash64` is fast but engine-specific. Where
 * cross-engine determinism matters (oracle checks, persisted fingerprints)
 * we use a **portable hash**: the first 15 hex chars of md5 parsed as a
 * 60-bit integer — identical in any engine with md5 (`conv`-free in DuckDB
 * via hex cast). Scale path uses `xxhash64` (see `portable` flags).
 */
object Text {

  /** 60-bit portable hash (md5-prefix). Stable across engines/versions. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Fast engine-local 64-bit hash (xxhash64) — the 100 TB path. */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Whitespace tokens of trimmed text (empty string → empty array). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: alnum runs and each punctuation char count
    * separately (a cheap proxy for subword tokenizers). */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))

  /** Character-class ratios over the raw string (0 when empty). */
  def ratioOf(c: Column, charClassRe: String): Column = {
    val len = length(c)
    when(len === 0 || c.isNull, lit(0.0)).otherwise(
      (len - length(regexp_replace(c, charClassRe, ""))).cast("double") / len)
  }
  def punctRatio(c: Column): Column = ratioOf(c, "[^a-zA-Z0-9\\s]")
  def digitRatio(c: Column): Column = ratioOf(c, "[0-9]")
  def upperRatio(c: Column): Column = ratioOf(c, "[A-Z]")
  def whitespaceRatio(c: Column): Column = ratioOf(c, "\\s")

  /** Language-specific stopword lists (tiny n-gram-free heuristic). Order of
    * `Langs` is the deterministic tie-break. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "se", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "non"))
  val Langs: Seq[String] = Seq("en", "de", "es", "fr", "it")

  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(c)), t => t.isin(words: _*)))

  /** Language ID: argmax of per-language stopword hits; "und" (undetermined)
    * when no list scores > 0. Ties break by `Langs` order. */
  def langId(c: Column): Column = {
    val scores = Langs.map(l => stopwordCount(c, Stopwords(l)))
    val best = scores.reduce((a, b) => greatest(a, b))
    // chained whens in Langs order ⇒ first language reaching the max wins
    val expr0 = Langs.zip(scores).foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (l, s)) => acc.when(s === best && best > 0, lit(l))
    }
    expr0.otherwise(lit("und"))
  }

  /** Stopword ratio against the union list (quality signal). */
  def stopwordRatio(c: Column): Column = {
    val all = Stopwords.values.flatten.toSeq.distinct
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(stopwordCount(c, all).cast("double") / n)
  }

  /** Document quality score in [0,1]: fixed deterministic blend of length,
    * punctuation, word-length sanity, and whitespace signals (the reference's
    * 0–100 scores are table-level; this is the per-document analogue used by
    * training-data filters). */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val lenScore = least(n / 100.0, lit(1.0))                       // longer is better up to 100 tokens
    val punctOk = lit(1.0) - least(punctRatio(c) * 4.0, lit(1.0))   // >25% punct → 0
    val avgWordLen = when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s", "")).cast("double") / n)
    val wordLenOk = when(avgWordLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val wsOk = lit(1.0) - least(whitespaceRatio(c) * 2.0, lit(1.0))
    round(lenScore * 0.4 + punctOk * 0.2 + wordLenOk * 0.2 + wsOk * 0.2, 4)
  }

  /** Canonical text normalization for fingerprinting: lower, collapse
    * whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: portable 60-bit hash of normalized text. */
  def fingerprint(c: Column): Column = portableHash(normalize(c))

  /** Word k-shingles of normalized text: array of space-joined k-grams.
    * Documents shorter than k words get their whole text as one shingle. */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(normalize(c))
    val n = size(toks)
    when(n <= k, array(concat_ws(" ", toks)).cast("array<string>"))
      .otherwise(transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Winnowed k-gram fingerprints (Schleimer–Wilkerson–Aiken winnowing,
    * SIGMOD 2003): portable hashes of the word k-shingles, reduced to the
    * MINIMUM hash of each window of `w` consecutive k-gram hashes, distinct.
    * Guarantee: two documents sharing any token run of length ≥ k + w − 1
    * share at least one fingerprint — the SUBSTRING-overlap primitive that
    * whole-doc fingerprints and set-similarity dedup can't express, and the
    * standard benchmark-decontamination tool for training corpora. Density
    * ≈ 2/(w+1) of the k-gram count, so the fingerprint explode stays small.
    * Docs shorter than k words fingerprint their whole normalized text.
    *
    * The k-gram hash array is BOUND ONCE as a lambda variable (the
    * single-element `transform(array(...))` wrap): a lambda body that
    * references a raw subtree re-evaluates it per element, so the naive
    * form recomputes ALL k-gram hashes for every window — measured 461 s
    * vs 8 s for the whole sf0.1 corpus. Shingle construction uses the
    * byte-path [[graft.functions.F.wordShingles]] twin. */
  def winnowedFingerprints(c: Column, k: Int = 5, w: Int = 4): Column = {
    val hashes = transform(graft.functions.F.wordShingles(c, k),
      s => portableHash(s))
    val perWindowMins = transform(array(hashes), h =>
      array_distinct(
        when(size(h) <= w, array(array_min(h)))
          .otherwise(transform(sequence(lit(0), size(h) - w),
            i => array_min(slice(h, i + 1, lit(w)))))))
    try_element_at(perWindowMins, lit(1))
  }

  /** Intra-document repetition ratio — the Gopher-style repetition quality
    * filter (Rae et al. 2021 §A1.1: "fraction of duplicate n-grams"):
    * 1 − distinct/total over word k-grams of normalized text. 0.0 for docs
    * of ≤ k words (single shingle); boilerplate/looping generations score
    * high. Pure per-row projection — composes with any filter threshold
    * without a shuffle. */
  def repetitionRatio(c: Column, k: Int = 2): Column = {
    val sh = shingles(c, k)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }
}
