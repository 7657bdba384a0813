package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators for a training-data pipeline over the `documents`
 * table: token counting, quality scoring, language id, fingerprinting.
 *
 * Design rule: everything that feeds a DuckDB oracle is built from engine-
 * portable expressions (split/trim/md5/translate/length) so the same SQL
 * reproduces bytes exactly; the non-portable ops (simhash) are pure Scala
 * with ScalaTest oracles instead. All are narrow, codegen'd column
 * expressions — no UDF in the hot path except simhash.
 */
object TextAnalysis {

  /** Whitespace tokenization — the portable baseline (matches DuckDB
    * `regexp_split_to_array(trim(text), '\s+')`). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword proxy: word pieces ≈ ceil(chars/4) per token, the
    * standard quick token estimate; integer arithmetic keeps it portable. */
  def tokenCountBpe(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("int"))

  /** GPT-2-style pre-tokenizer regex (contractions | letter runs | digit
    * runs | punct runs, optionally space-prefixed) — the "BPE-ish regex"
    * counter; RE2-compatible so the DuckDB oracle matches exactly. */
  val SubwordPattern = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def tokenCountSubword(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0)))

  /** Stopword list frozen for quality scoring + language id. */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(StopwordsEn.map(lit(_)): _*)))

  /** Punctuation count via translate-delta (portable to DuckDB). */
  val PunctChars = ".,!?;:"
  def punctCount(text: Column): Column =
    length(text) - length(translate(text, PunctChars, ""))

  /**
   * Quality score in [0,1]: length band + stopword presence − punctuation
   * excess; the heuristic mix of a Gopher/C4-style filter, frozen:
   *   0.5·[50 ≤ chars ≤ 20000] + 0.3·min(stopwords,5)/5 + 0.2·[punct/chars ≤ 0.1]
   */
  def qualityScore(text: Column): Column = {
    val chars = length(text)
    val lenOk = (chars >= 50 && chars <= 20000).cast("double") * 0.5
    val stopOk = least(stopwordCount(text).cast("double"), lit(5.0)) / 5.0 * 0.3
    val punctOk = (punctCount(text).cast("double") <=
      chars.cast("double") * 0.1).cast("double") * 0.2
    round(lenOk + stopOk + punctOk, 2)
  }

  /** Per-language marker words for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "is", "en" -> "with",
    "de" -> "der", "de" -> "und", "de" -> "das", "de" -> "ist", "de" -> "mit",
    "fr" -> "le", "fr" -> "et", "fr" -> "les", "fr" -> "est", "fr" -> "avec",
    "es" -> "el", "es" -> "y", "es" -> "los", "es" -> "es", "es" -> "con",
    "fi" -> "ja", "fi" -> "on", "fi" -> "se", "fi" -> "ei", "fi" -> "että")

  /**
   * Language id: explode tokens, broadcast-join the marker table, count hits
   * per (doc, lang), argmax with deterministic (count desc, lang asc)
   * tie-break; docs with no hits → 'und'. Relational (SQL-oracle-able), one
   * narrow explode + broadcast join + two-level agg.
   *
   * @param docs must have columns (`idCol`, `textCol`)
   */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = broadcast(LangMarkers.toDF("m_lang", "m_tok"))
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val hits = toks.join(markers, $"tok" === $"m_tok")
      .groupBy(col(idCol), $"m_lang").agg(count(lit(1)).as("hits"))
    // argmax hits, tie → smallest lang: min_by over (-hits, lang)
    val top = hits.groupBy(col(idCol))
      .agg(min_by($"m_lang", struct((-$"hits").as("nh"), $"m_lang")).as("lang_pred"))
    docs.select(col(idCol)).join(top, Seq(idCol), "left")
      .select(col(idCol), coalesce($"lang_pred", lit("und")).as("lang_pred"))
  }

  /** Portable document fingerprint: md5 of lowercased whitespace-collapsed
    * text (identical in DuckDB). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling FNV-1a fingerprint over normalized text — the fast
    * non-cryptographic variant (Scala; ScalaTest-verified, no SQL oracle). */
  // hoisted: String.replaceAll would re-compile this regex on EVERY call,
  // and fnv1a64 runs per token inside the simhash inner loop
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val norm = WsRun.matcher(s.trim.toLowerCase).replaceAll(" ")
    var i = 0
    while (i < norm.length) {
      h ^= norm.charAt(i).toLong & 0xffffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  val fingerprintFnv = udf((s: String) => fnv1a64(if (s == null) "" else s))
}
