package graft.ingest

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the north-rule input table (BASELINE.json `input_hint`):
  * Common-Crawl-style web pages. */
case class RawPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * Deterministic synthetic corpus generator (seed-pure; no external data).
 *
 * Replaces the reference's LFS-stripped Wikimedia dump fixtures
 * (`TestHelper.kt:21-53`) with generated pages whose `html` embeds
 * `<a href>` anchors realizing chosen topologies, and whose `text` column is
 * produced by [[Extract.extractText]] itself — so the byte-identical
 * per-url invariant holds by construction and is re-checkable at any time.
 *
 * Two tiers:
 *  - fixture corpora (tiny, hand-shaped; FIXTURES.md §3) for golden tests
 *  - `generate(spark, n, …)`: scalable generator, a pure function of
 *    (seed, n, page-id) — each page derives only from its own id, so the
 *    output is identical at any parallelism / partitioning (SURVEY.md §7.4).
 */
object SynthCorpus {

  val BaseTs: Long = 1704067200000L // 2024-01-01T00:00:00Z, fixed epoch

  def urlOf(slug: String): String = s"https://synth.example/wiki/$slug"

  /** Deterministic html for a page: title, paragraph fluff, anchor list,
    * optional canonical-redirect. */
  def htmlFor(
      slug: String,
      linkSlugs: Seq[String],
      redirectTo: Option[String] = None,
      fluffSeed: Long = 0L): String = {
    val sb = new StringBuilder
    sb ++= "<html><head><title>" ++= slug ++= "</title>"
    redirectTo.foreach { t =>
      sb ++= s"""<link rel="canonical" href="${urlOf(t)}">"""
    }
    sb ++= "<style>body{margin:0}</style></head><body>"
    sb ++= s"<h1>${slug.replace('-', ' ')}</h1>"
    val rng = new java.util.Random(fluffSeed ^ 0x5DEECE66DL)
    val words = Array("graph", "link", "page", "crawl", "web", "node", "edge",
      "data", "index", "query", "rank", "path", "set", "scan", "join")
    val nWords = 8 + rng.nextInt(24)
    sb ++= "<p>"
    var i = 0
    while (i < nWords) { sb ++= words(rng.nextInt(words.length)) ++= " "; i += 1 }
    sb ++= "</p><ul>"
    linkSlugs.foreach { t =>
      sb ++= s"""<li><a href="${urlOf(t)}">${t.replace('-', ' ')}</a></li>"""
    }
    sb ++= "</ul><script>var x=1;</script></body></html>"
    sb.toString
  }

  /** Build one RawPage; `text` derived from html by the normative extractor. */
  def page(
      slug: String,
      linkSlugs: Seq[String],
      redirectTo: Option[String] = None,
      lang: String = "en",
      tsOffsetSec: Long = 0L): RawPage = {
    val html = htmlFor(slug, linkSlugs, redirectTo,
      fluffSeed = slug.hashCode.toLong)
    RawPage(
      url = urlOf(slug),
      warc_ts = new Timestamp(BaseTs + tsOffsetSec * 1000L),
      html = html.getBytes(StandardCharsets.UTF_8),
      text = Extract.extractText(html),
      lang = lang)
  }

  // ---------------------------------------------------------------------------
  // Fixture corpora (FIXTURES.md §3) — each embeds a reference test scenario.
  // ---------------------------------------------------------------------------

  /** A→B→C chain; mirrors `SegmentGraphIntegrationTest.kt:48-78`. */
  def chain3: Seq[RawPage] = Seq(
    page("A", Seq("B")), page("B", Seq("C")), page("C", Nil))

  /** Gdansk→Polska direct link plus noise; `RouteIntegrationTest.kt:39-42`. */
  def direct: Seq[RawPage] = Seq(
    page("Gdansk", Seq("Polska", "Noise-1")),
    page("Polska", Seq("Noise-2")),
    page("Noise-1", Seq("Noise-2")),
    page("Noise-2", Seq("Gdansk")))

  /** Route through a redirect node: Polska→Polsko(redirect)→Baltycke-Morze;
    * redirects stay traversable with one out-edge (`WikiProcessor.kt:232-241`,
    * `RouteIntegrationTest.kt:53-56`). */
  def viaRedirect: Seq[RawPage] = Seq(
    page("Polska", Seq("Polsko")),
    page("Polsko", Nil, redirectTo = Some("Baltycke-Morze")),
    page("Baltycke-Morze", Nil))

  /** Redirect cycle r1→r3→r1 plus r2→r1 and a real article; the cycle members
    * must be dropped, r2 survives only if its chain ends at an article —
    * mirrors `WikiLinksTest.kt:75-96` (3-cycle keeps exactly the resolvable
    * members). Here r1,r3 cycle ⇒ dropped; r2→r1 dangles into the dropped
    * cycle ⇒ dropped too; article survives. */
  def redirectCycle: Seq[RawPage] = Seq(
    page("r1", Nil, redirectTo = Some("r3")),
    page("r3", Nil, redirectTo = Some("r1")),
    page("r2", Nil, redirectTo = Some("r1")),
    page("Article", Seq("r2")))

  /** Links to urls that are never pages → dropped (`WikiProcessor.kt:245-251`). */
  def dangling: Seq[RawPage] = Seq(
    page("Home", Seq("Exists", "Never-1", "Never-2")),
    page("Exists", Seq("Never-3")))

  /** Page repeats the same href ×2 → edges distinct (`WikiLinksTest.kt:127-136`). */
  def dupLinks: Seq[RawPage] = Seq(
    page("Dup", Seq("Target", "Target", "Other")),
    page("Target", Nil), page("Other", Nil))

  /** Two components; route across = no-route (distinct from missing page). */
  def disconnected: Seq[RawPage] = Seq(
    page("Island-A1", Seq("Island-A2")), page("Island-A2", Seq("Island-A1")),
    page("Island-B1", Seq("Island-B2")), page("Island-B2", Nil))

  /** Power-law hub: hub page linked by ~half of all pages (north-rule skew). */
  def hubSkew(n: Int = 64): Seq[RawPage] = {
    val hub = page("Hub", Seq("Spoke-0"))
    val spokes = (0 until n).map { i =>
      val links = if (i % 2 == 0) Seq("Hub", s"Spoke-${(i + 1) % n}")
                  else Seq(s"Spoke-${(i + 1) % n}")
      page(s"Spoke-$i", links)
    }
    hub +: spokes
  }

  /** All fixtures merged into one corpus (slugs are disjoint by construction). */
  def allFixtures: Seq[RawPage] =
    chain3 ++ direct ++ viaRedirect ++ redirectCycle ++ dangling ++ dupLinks ++
      disconnected ++ hubSkew(16)

  // ---------------------------------------------------------------------------
  // Scalable generator — pure function of (seed, n, id); parallelism-invariant.
  // ---------------------------------------------------------------------------

  /** Mix for per-page rng seeding (splitmix64 finalizer — public domain). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E9B5L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def slugFor(id: Long): String = f"p${mix64(id) & 0xFFFFFFL}%06x-$id"

  /** Deterministic page for one id: out-degree ~ mean `avgDeg`, targets
    * skewed so low ids are hubs (Zipf-ish in-degree); ~3% redirects. */
  def pageFor(id: Long, n: Long, avgDeg: Int, seed: Long): RawPage = {
    val rng = new java.util.Random(mix64(seed ^ (id * 0x9E3779B97F4A7C15L)))
    val slug = slugFor(id)
    val isRedirect = n > 20 && rng.nextInt(100) < 3
    if (isRedirect) {
      var t = rng.nextLong(n) // redirect target: any other page
      if (t == id) t = (t + 1) % n
      page(slug, Nil, redirectTo = Some(slugFor(t)),
        lang = langFor(rng), tsOffsetSec = id)
    } else {
      val deg = 1 + rng.nextInt(math.max(1, 2 * avgDeg - 1))
      val targets = scala.collection.mutable.LinkedHashSet[String]()
      var k = 0
      while (k < deg) {
        // skewed target choice: square of uniform → low ids are hubs
        val u = rng.nextDouble()
        var t = (u * u * n).toLong.min(n - 1)
        if (rng.nextInt(4) == 0) t = rng.nextLong(n) // mix in uniform tail
        if (t != id) targets += slugFor(t)
        k += 1
      }
      page(slug, targets.toSeq, lang = langFor(rng), tsOffsetSec = id)
    }
  }

  private val Langs = Vector("en", "en", "en", "de", "fr", "es", "fi")
  private def langFor(rng: java.util.Random): String = Langs(rng.nextInt(7))

  /** Distributed generation: `spark.range` partitions the id space; each page
    * is a pure function of its id ⇒ identical output at any parallelism. */
  def generate(spark: SparkSession, n: Long, avgDeg: Int = 8, seed: Long = 42L,
      numPartitions: Int = 0): Dataset[RawPage] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map(id => pageFor(id, n, avgDeg, seed))
  }

  /** Local (driver-side) generation for tests/oracles. */
  def generateLocal(n: Long, avgDeg: Int = 8, seed: Long = 42L): Seq[RawPage] =
    (0L until n).map(id => pageFor(id, n, avgDeg, seed))

  def toDF(spark: SparkSession, pages: Seq[RawPage]): Dataset[RawPage] = {
    import spark.implicits._
    spark.createDataset(pages)
  }
}
