package graft.query

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import graft.graph.GraphBuilder
import graft.ingest.SynthCorpus

/** Scripted-stdin tests of the interactive query loop (reference parity:
  * `Main.kt:283-339` wildcard/random/missing-page flows) and the
  * missing-endpoint error trio (`BadRouteException.java:5-46`). */
class InteractiveSpec extends SparkTestBase {

  private def u(slug: String): String = SynthCorpus.urlOf(slug)

  private lazy val routes: Routes =
    new Routes(GraphBuilder.build(
      SynthCorpus.toDF(spark, SynthCorpus.direct).toDF(), smallIds = true))

  /** Drive the loop with scripted input; return everything it printed. */
  private def drive(script: String*): String = {
    val in = new BufferedReader(new StringReader(script.mkString("\n")))
    val buf = new ByteArrayOutputStream()
    val out = new PrintStream(buf, true, "UTF-8")
    Interactive.run(routes, in, out, seed = 7L)
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  test("wildcard listing, bad name hint, then a typed route") {
    val printed = drive(
      "#",                 // rejected: wildcard needs a prefix
      s"${u("Gda")}#",     // wildcard listing (urls are the page names)
      "NoSuchPage",        // miss → hint
      u("Gdansk"),         // valid start
      u("Polska"))         // valid end → route; then EOF ends the loop
    assert(printed.contains("Must have at least one char before the wildcard"))
    assert(printed.contains(s"""At least these articles start with "${u("Gda")}""""))
    assert(printed.contains(u("Gdansk"))) // the listing includes the page
    assert(printed.contains("""No page with name "NoSuchPage" found. Try wildcards?"""))
    assert(printed.contains(s"""Route: "${u("Gdansk")}" -> "${u("Polska")}""""))
  }

  test("random pick ('<') selects a real page for both endpoints and routes") {
    val printed = drive("<", "<")
    assert(printed.contains("as starting page"))
    assert(printed.contains("as end page"))
    assert(printed.contains("Route: ") || printed.contains("No route found"))
    // deterministic under the injected seed
    assert(drive("<", "<") == printed)
  }

  test("empty wildcard prefix lists pages; unknown prefix reports none") {
    val printed = drive("Zzz#")
    assert(printed.contains("""No articles start with "Zzz""""))
  }

  test("driver prefix index == distributed TakeOrderedAndProject; utf8 collation") {
    import spark.implicits._
    for (p <- Seq("", "https://synth.example/wiki/", u("Gda"), "Zzz", u("Polska")))
      assert(routes.prefixSearch(p, 10) ==
        Lookups.prefixTopK(routes.pages, p, 10).map(_.url), s"prefix '$p'")
    // collation parity: unsigned UTF-8 bytes, NOT Java's UTF-16 order.
    // U+FFFD (EF BF BD) sorts BEFORE U+1F600 (F0 9F 98 80) bytewise, but
    // AFTER it in UTF-16 code-unit order (D83D < FFFD).
    val repl = "�"
    val emoji = "😀"
    assert(Routes.utf8Compare(repl, emoji) < 0)
    assert(repl.compareTo(emoji) > 0) // Java natural order disagrees...
    val sparkOrder = Seq(emoji, repl).toDF("s").orderBy($"s")
      .as[String].collect().toSeq
    assert(sparkOrder == Seq(repl, emoji)) // ...and Spark agrees with utf8Compare
  }

  test("url index serves the REPL above the interactive EDGE threshold") {
    // force every route onto the distributed superstep path
    // (interactiveMaxEdges = 0) — prompt validation, wildcard listing and
    // random pick must STILL be job-free driver lookups (pages ≪ edges)
    val big = new Routes(GraphBuilder.build(
      SynthCorpus.toDF(spark, SynthCorpus.direct).toDF(), smallIds = true),
      interactiveMaxEdges = 0L)
    assert(big.hasPage(u("Gdansk"))) // builds the url index (one-time)
    // prove "index-backed" deterministically: ZERO Spark jobs may run for
    // warm prompt validation / wildcard / random (a wall-clock bound would
    // be flaky under co-tenant load)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    val checks = Seq(
      big.hasPage(u("Polska")), !big.hasPage("nope"),
      big.prefixSearch(u("Gda"), 5).contains(u("Gdansk")),
      big.randomUrl(7L).isDefined)
    assert(checks.forall(identity))
    val ran = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .toSet.diff(before)
    assert(ran.isEmpty,
      s"Spark jobs $ran ran during index-backed prompt validation")
    // parity with the distributed lookups
    assert(big.prefixSearch(u("Gda"), 10) ==
      Lookups.prefixTopK(big.pages, u("Gda"), 10).map(_.url))
    // routes themselves run distributed and resolve urls via the index
    val route = big.findRoute(u("Gdansk"), u("Polska"))
    assert(route == routes.findRoute(u("Gdansk"), u("Polska")))
    intercept[MissingBoth](big.findRoute("nope1", "nope2"))
  }

  test("missing-endpoint trio: start, end, and BOTH have distinct errors") {
    intercept[MissingStart](routes.findRoute("nope1", u("Polska")))
    intercept[MissingEnd](routes.findRoute(u("Polska"), "nope2"))
    val both = intercept[MissingBoth](routes.findRoute("nope1", "nope2"))
    assert(both.startUrl == "nope1" && both.endUrl == "nope2")
    // distributed path agrees
    intercept[MissingBoth](routes.findRouteDistributed("nope1", "nope2"))
  }
}
