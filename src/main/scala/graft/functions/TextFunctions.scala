package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * token counting, fingerprinting, quality scoring, language ID — all as
  * codegen-friendly Column expressions (no UDFs), so they inline into
  * whole-stage codegen and run at scan speed on 100 TB of text.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped. */
  // array_remove(split(...)) over a filter() lambda: identical result
  // (split never yields nulls), but array_remove is a codegen'd native
  // expression while higher-order filter is interpreted — this sits in
  // the hot path of every tokenize-heavy operator
  def tokens(text: Column): Column =
    array_remove(split(text, " "), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-space symbols — a cheap, deterministic token count for budget
    * estimation when no real tokenizer is available. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed text. Equal fingerprints = exact dups modulo
    * formatting. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/reordered copies. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Ratio of tokens found in `words` (used for stopword density and
    * language scoring). */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val inSet = tokens(text).cast("array<string>")
    val hits = size(filter(inSet, t => t.isin(words.map(lit(_)): _*)))
    when(size(inSet) > 0, hits.cast("double") / size(inSet)).otherwise(0.0)
  }

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Composite quality score in [0,1]: length sweet-spot, alpha ratio,
    * stopword presence — the standard cheap pre-filter before expensive
    * model-based scoring. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = when(nChars.between(100, 5000), 1.0)
      .when(nChars < 100, nChars.cast("double") / 100.0)
      .otherwise(lit(5000.0) / nChars.cast("double"))
    val stopScore = least(wordSetRatio(text, EnStopwords) * 5.0, lit(1.0))
    val avgWordLen = when(nTok > 0, length(text).cast("double") / nTok).otherwise(0.0)
    val wordLenScore = when(avgWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore + stopScore + wordLenScore) / 3.0, 4)
  }

  /** Language-ID stopword tables (tiny n-gram-free heuristic: count
    * function-word hits per language, argmax with fixed tie order). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"))

  def langHits(text: Column, lang: String): Column = {
    val words = LangStopwords.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))
  }

  /** Predicted language: argmax of stopword hits; ties resolve in the
    * fixed order en > de > es > fr; zero hits everywhere → "unknown". */
  def langId(text: Column): Column = {
    val scored = LangStopwords.map { case (l, _) => (l, langHits(text, l)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // fold from the lowest-priority language outward so the FIRST entry
    // in LangStopwords wins ties (its `when` ends up outermost)
    scored.reverse.foldLeft(lit("unknown"): Column) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** PII-style redaction patterns, applied in order (most specific
    * first, so an email is tagged `<email>` before the digit rule can
    * eat its domain digits). Tag names must themselves be digit-free —
    * a later pattern must never match inside an earlier tag (`<ipv4>`
    * would become `<ipv<number>>`). RE2-compatible regexes only, so the
    * same patterns run verbatim in Spark, DuckDB, and Go/Rust
    * scrubbers. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "number" -> "\\d+")

  /** Regex scrub (the C4-style PII pass): each pattern match is
    * replaced by its `<name>` tag. Pure per-row map — codegen'd
    * regexp_replace chain, no shuffle, trivially linear at 100 TB. */
  def redact(text: Column,
             patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.foldLeft(text) { case (acc, (name, p)) =>
      regexp_replace(acc, p, s"<$name>")
    }
}
