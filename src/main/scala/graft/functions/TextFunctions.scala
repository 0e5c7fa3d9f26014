package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines —
  * beyond-reference extensions (SURVEY §7.2 M5): language-ID, quality
  * scoring, token counting, document fingerprinting. All are pure
  * `functions._` Column compositions (whole-stage-codegen-friendly, no
  * UDFs) so they stay inside Tungsten at 100 TB.
  */
object TextFunctions {

  /** Tokens: lowercased word sequences. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish sub-token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap proxy for BPE
    * vocabulary growth used for corpus sizing.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Minimal per-language stopword lists for the n-gram/stopword
    * language-ID heuristic. Deterministic and tiny by design — the
    * documents fixture vocabulary is English-ish so `en` dominates.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una", "para"),
    "it" -> Seq("il", "la", "e", "di", "che", "non", "un", "una", "per", "con"))

  /** Stopword hit count for one language. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = array(Stopwords(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  /** Language-ID: argmax of stopword hit rate across languages, 'und'
    * (undetermined) when nothing matches. Ties break by language-code
    * order for determinism.
    */
  def langId(text: Column): Column = {
    val langs = Stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    // struct ordering compares hits first, then lang — deterministic
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality-score components (length / punctuation / stopword ratios —
    * SURVEY north-star text analysis). All ratios in [0,1].
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}]", "")).cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordHits(text, "en").cast("double") / n)
  }

  def meanWordLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / n)
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with
    * low punctuation/digit noise and a natural stopword rate.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 5.0)
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.2 + digitPenalty * 0.2 + swScore * 0.2), 6)
  }

  /** Canonical fingerprint key (OpenRefine-style): sorted distinct
    * lowercase tokens joined by a single space. Two documents with the
    * same token multiset collapse to one key.
    */
  def fingerprintKey(text: Column): Column =
    concat_ws(" ", array_sort(array_distinct(
      filter(tokens(text), t => length(t) > 0))))

  /** 64-bit fingerprint of the canonical key (xxhash64 — stable across
    * Spark versions and partitionings). As a DEDUP KEY this has the
    * 64-bit birthday collision risk (~27 expected false-merges at
    * 3×10¹⁰ docs) — use [[fingerprint128]] when grouping a corpus on it.
    */
  def fingerprint64(text: Column): Column = xxhash64(fingerprintKey(text))

  /** 128-bit fingerprint of the canonical key as a struct of two
    * independently-seeded xxhash64 words — collision-safe at corpus scale
    * (n²/2¹²⁹ birthday term). Same construction as
    * [[graft.operators.Dedup]]'s internal grouping key.
    */
  def fingerprint128(text: Column): Column = {
    val k = fingerprintKey(text)
    struct(xxhash64(lit(1L), k).as("h1"), xxhash64(lit(2L), k).as("h2"))
  }

  // PII patterns kept to constructs with identical semantics in Java
  // regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  // repetition, \b/\d/\s — no backreferences or lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\+?\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}"

  /** PII redaction for training corpora: emails, IPv4 addresses and
    * phone-shaped numbers replaced with a marker. Order matters — IPs
    * before phones, or the phone pattern would eat dotted quads. Pure
    * codegen'd regexp_replace chain, no UDF.
    */
  def redactPii(text: Column, marker: String = "[REDACTED]"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, marker),
        Ipv4Re, marker),
      PhoneRe, marker)

  /** Fraction of non-empty lines that are duplicates of an earlier line —
    * the Gopher-style boilerplate signal (nav bars, footers, license
    * headers repeat; prose doesn't). 0 for texts of ≤ 1 line.
    */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    when(size(lines) <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines))
  }

  /** Fraction of whitespace tokens that are repeats — high values mark
    * keyword-stuffed or generated boilerplate.
    */
  def dupWordRatio(text: Column): Column =
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(tokens(text))).cast("double") / size(tokens(text)))

  /** Normalized text for near-dup pipelines: lowercase, strip
    * punctuation, collapse whitespace.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Word n-gram shingles over normalized text (default n=3). Native
    * single-pass expression — see graft.plans.WordShingles for why the
    * built-ins composition (kept below as wordShinglesHof) is too slow on
    * the LSH hot path.
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.plans.ShingleExpression.wordShingles(text, n)

  /** Built-ins-only variant (cross-check for the native expression). */
  def wordShinglesHof(text: Column, n: Int = 3): Column = {
    val toks = split(normalizeText(text), " ")
    val cnt = size(toks)
    when(cnt < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), cnt - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Character n-gram shingles over normalized text (default n=5). */
  def charShingles(text: Column, n: Int = 5): Column = {
    val s = normalizeText(text)
    val len = length(s)
    when(len <= n, array(s)).otherwise(
      array_distinct(transform(sequence(lit(1), len - n + 1),
        i => s.substr(i, lit(n)))))
  }
}
