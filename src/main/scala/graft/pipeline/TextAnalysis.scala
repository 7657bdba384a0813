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

  /** Word n-grams WITH duplicates (space-joined token windows) — the
    * multiset [[graft.pipeline.Dedup.shingles]] distincts; repetition
    * scoring needs the duplicates kept. */
  private def wordGrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Duplicate word-n-gram fraction in [0,1] — the Gopher-style intra-doc
    * repetition signal (boilerplate loops, keyword stuffing, decode
    * glitches): 1 − |distinct n-grams| / |n-grams| over the doc's gram
    * multiset; 0 for docs shorter than n tokens. Rounded to 6 decimals so
    * the DuckDB oracle compares exactly.
    *
    * Runs the one-pass [[repetitionRaw]] kernel, not the HOF tree: Catalyst
    * interprets `transform`/`slice`/`array_distinct` per window AND
    * re-evaluates the shared gram subtree for each of its three references
    * — measured 11.0 s for the rep2 filter over sf0.1 where the kernel
    * takes a scan-bound pass (the same finding, and the same fix, as
    * `Dedup.shingleSeq`). [[repetitionFractionPortable]] keeps the HOF
    * formulation as the parity reference, A/B-gated in PipelineSpec. */
  def repetitionFraction(text: Column, n: Int): Column =
    round(repetitionUdf(text, lit(n)), 6)

  /** The HOF formulation [[repetitionFraction]] replaced — the DuckDB
    * oracle's shape, kept as the semantics reference the kernel is
    * parity-tested against. */
  private[pipeline] def repetitionFractionPortable(text: Column, n: Int): Column = {
    val grams = wordGrams(text, n)
    round(when(size(grams) <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double") /
        size(grams).cast("double")), 6)
  }

  /** Unrounded duplicate-gram fraction, one pass: replicates
    * `tokens` = `split(trim(text), "\\s+")` exactly (Spark SQL `trim`
    * strips SPACE U+0020 only; Spark `split` is Java split with limit -1,
    * so leading non-space whitespace yields an empty first token — all
    * preserved here, same as `Dedup.shingleSeq`). */
  private[pipeline] def repetitionRaw(text: String, n: Int): Double = {
    if (text == null) return 0.0
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val toks = WsRun.split(text.subSequence(lo, hi), -1)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    var distinct = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / total.toDouble
  }

  private val repetitionUdf = udf((s: String, n: Int) => repetitionRaw(s, n))

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

  // ---------------------------------------------------------------------------
  // Winnowing (sub-document fingerprints)
  // ---------------------------------------------------------------------------

  private val HexChars = "0123456789abcdef".toCharArray

  /**
   * Winnowing fingerprint kernel (Schleimer–Wilkerson–Aiken, SIGMOD'03):
   * hash every char k-gram, slide a w-gram window, select the window's
   * minimum hash (RIGHTMOST position on ties), emit the distinct selections
   * as (1-based gram position, hash). Whole-doc digests only find identical
   * documents; winnowing's guarantee is per-PASSAGE: any shared substring of
   * length ≥ k + w - 1 yields at least one shared fingerprint, and no
   * selected gap exceeds w (both property-tested in KernelProperties).
   *
   * Hash = first 8 hex chars of md5(gram) so the DuckDB oracle reproduces
   * the selection bit-for-bit. Grams are k Unicode CODE POINTS (never split
   * a surrogate pair): DuckDB's len/substr count code points, so UTF-16-unit
   * indexing would diverge from the oracle on non-BMP text (emoji); for BMP
   * text the two are identical. One pass per document: a monotone deque
   * keeps window minima at O(1) amortized per gram (equal-hash entries are
   * popped when a later one arrives, which IS the rightmost-tie rule).
   * Documents shorter than k code points produce no fingerprints; documents
   * with fewer than w grams are one degenerate window.
   */
  def winnowSeq(text: String, k: Int, w: Int): Seq[(Long, String)] = {
    require(k > 0 && w > 0, "winnow needs k > 0 and w > 0")
    if (text == null) return Seq.empty
    val cps = text.codePointCount(0, text.length)
    val n = cps - k + 1
    if (n <= 0) return Seq.empty
    // char offset of each code-point boundary (cps+1 entries); amortized
    // O(length) — each offsetByCodePoints advances exactly one code point
    val off = new Array[Int](cps + 1)
    var ci = 0
    var cp = 0
    while (cp < cps) { off(cp) = ci; ci = text.offsetByCodePoints(ci, 1); cp += 1 }
    off(cps) = text.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[String](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(text.substring(off(i), off(i + k))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(8)
      var b = 0
      while (b < 4) {
        sb.append(HexChars((d(b) >> 4) & 0xf)).append(HexChars(d(b) & 0xf))
        b += 1
      }
      hs(i) = sb.toString
      i += 1
    }
    val out = new java.util.LinkedHashSet[(Long, String)]()
    val deque = new java.util.ArrayDeque[Int]()
    val nwin = math.max(n - w + 1, 1)
    var j = 0
    var s = 0
    while (s < nwin) {
      val end = math.min(s + w, n) // window grams [s, end)
      while (j < end) {
        while (!deque.isEmpty && hs(deque.peekLast()) >= hs(j)) deque.pollLast()
        deque.addLast(j)
        j += 1
      }
      while (deque.peekFirst() < s) deque.pollFirst()
      val sel = deque.peekFirst()
      out.add(((sel + 1).toLong, hs(sel)))
      s += 1
    }
    import scala.jdk.CollectionConverters._
    out.iterator().asScala.toSeq
  }

  private val winnowUdf = udf((s: String, k: Int, w: Int) => winnowSeq(s, k, w))

  /** Winnowing fingerprints as a table: (id, pos, fp) — distinct selected
    * (position, hash) pairs per document. Narrow (one UDF pass per doc +
    * explode); the inverted index over `fp` is what a shared-passage search
    * joins on. */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 6): DataFrame = {
    docs.select(col(idCol).as("id"),
        explode(winnowUdf(col(textCol), lit(k), lit(w))).as("sel"))
      .select(col("id"), col("sel._1").as("pos"), col("sel._2").as("fp"))
  }

  private val winnowFpUdf = udf((s: String, k: Int, w: Int) =>
    winnowSeq(s, k, w).map(_._2).distinct)

  /** Distinct selected fingerprint hashes per document (positions dropped) —
    * the posting list a shared-passage inverted index joins on
    * ([[graft.pipeline.Dedup.winnowPairs]]). Dedup happens INSIDE the kernel
    * (before the explode) so it is narrow — no shuffle; equivalent to
    * `winnow(...).select(id, fp).distinct()` because ids are unique per
    * input row (the same primary-key contract [[graft.pipeline.Dedup.docShingles]]
    * documents). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 6): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(winnowFpUdf(col(textCol), lit(k), lit(w))).as("fp"))
}
