package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything is composed from codegen'd built-ins (no UDFs), so the whole
  * stage stays inside WholeStageCodegen and scans 100 TB at parquet-read
  * speed — these are per-row map operations with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word chunks, digits, and punctuation runs as
    * separate tokens — a cheap deterministic proxy for a real tokenizer's
    * token count (useful for budget estimation over a corpus).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character length. */
  def charCount(text: Column): Column = length(text)

  /** Mean word length — a classic quality signal (gibberish and boilerplate
    * skew it).
    */
  def meanWordLength(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double"))

  /** Fraction of characters that are alphabetic. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        length(text).cast("double"))

  /** Fraction of tokens that are in a stopword list (English defaults).
    * High ratio ≈ natural prose; near-zero ≈ tables/code/boilerplate.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isin(stopwords.map(lit(_)): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length band + alpha ratio + stopword
    * presence, equally weighted. Deterministic, tunable, shuffle-free.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    round((lenOk + alpha + stop) / lit(3.0), 4)
  }

  /** Language ID via stopword-hit voting: for each candidate language,
    * count how many of its top function words appear as tokens; pick the
    * argmax (ties -> lexicographically GREATEST language code, the order
    * array_max over struct(hits, lang) induces; 'und' if no hits).
    *
    * An n-gram/function-word heuristic in pure Spark SQL expressions —
    * per-row, no shuffle, no UDF. Precision is what a 40-word-per-language
    * profile buys; swap the profiles for real ones without touching the
    * plumbing.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "[\\s\\p{Punct}]+"))
    val scored = LangProfiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(lit(_)): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: MD5 of whitespace-normalized lowercase text.
    * The exact-dedup key; stable across engines.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-hash (Rabin-Karp-style) fingerprint over word tokens:
    * order-sensitive, cheap, and expressible with aggregate() — used for
    * near-identity detection where MD5 is too strict. Accumulator kept
    * modulo a Mersenne prime so it never overflows (ANSI-mode safe).
    * Per-token hash is the first 15 hex digits of md5 (engine-portable:
    * the DuckDB oracle replicates it exactly via list_reduce, so q19 is
    * hash-checked rather than rows-only).
    */
  def rollingHash(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val tokHash = (t: Column) =>
      conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long")
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + tokHash(t), lit(2147483647L)))
  }

  /** Flesch-Kincaid grade + Flesch reading ease (Kincaid et al. 1975 /
    * Flesch 1948 — the readability pair every document-quality stack
    * reports), with the classic cheap proxies: syllables ≈ vowel-group
    * runs (floored at one per word) and sentences ≈ terminal-punctuation
    * runs (floored at 1). Returns a struct
    * (n_words, n_sentences, n_syllables, fk_grade, flesch_ease) — pure
    * map-side regexp arithmetic, engine-replayable, rounded to 4.
    */
  def readability(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences = greatest(lit(1L),
      regexp_count(text, lit("[.!?]+"))).cast("double")
    val syllables = greatest(words,
      regexp_count(lower(text), lit("[aeiouy]+")).cast("double"))
    val safeWords = greatest(words, lit(1.0))
    struct(
      words.cast("long").as("n_words"),
      sentences.cast("long").as("n_sentences"),
      syllables.cast("long").as("n_syllables"),
      round(lit(0.39) * (words / sentences)
        + lit(11.8) * (syllables / safeWords) - lit(15.59), 4).as("fk_grade"),
      round(lit(206.835) - lit(1.015) * (words / sentences)
        - lit(84.6) * (syllables / safeWords), 4).as("flesch_ease"))
  }

  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "for", "on", "with", "as", "at", "by", "be", "this", "that",
    "from", "not", "but", "they", "we", "you", "he", "she", "his", "her")

  /** Tiny function-word profiles per language (public-knowledge word lists). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "nicht"),
    "pt" -> Seq("o", "de", "que", "e", "do", "da", "em", "um", "para", "com"),
    "it" -> Seq("di", "che", "e", "il", "la", "per", "un", "in", "del", "non"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "is", "op", "te", "niet"),
    "sv" -> Seq("och", "att", "det", "som", "en", "av", "den", "till", "är", "på")
  )
}
