package graft.ingest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Column-level bindings for [[Extract]]. Kept as thin `udf` wrappers around
 * the pure functions so the normative implementation has exactly one home;
 * the UDFs are deterministic (declared via `.asNondeterministic()` NOT being
 * called) so Catalyst may collapse/push them.
 *
 * Scale note: these run once per page in the ETL scan stage (narrow, no
 * shuffle); the html column is pruned immediately after (SURVEY.md §4).
 */
object ExtractFunctions {

  private val extractTextUdf = udf((html: Array[Byte]) => Extract.extractText(html))
  private val extractLinksUdf =
    udf((html: Array[Byte], url: String) => Extract.extractLinks(html, url))
  private val extractRedirectUdf =
    udf((html: Array[Byte], url: String) => Extract.extractRedirect(html, url).orNull)
  private val normalizeUrlUdf = udf((url: String) => Extract.normalizeUrl(url))

  def extract_text(html: Column): Column = extractTextUdf(html)
  def extract_links(html: Column, url: Column): Column = extractLinksUdf(html, url)
  def extract_redirect(html: Column, url: Column): Column = extractRedirectUdf(html, url)
  def normalize_url(url: Column): Column = normalizeUrlUdf(url)

  /** SQL-surface registration (parity with DataFrame API). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("extract_text", (html: Array[Byte]) => Extract.extractText(html))
    spark.udf.register("extract_links",
      (html: Array[Byte], url: String) => Extract.extractLinks(html, url))
    spark.udf.register("extract_redirect",
      (html: Array[Byte], url: String) => Extract.extractRedirect(html, url).orNull)
    spark.udf.register("normalize_url", (url: String) => Extract.normalizeUrl(url))
  }
}
