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

  test("missing-endpoint trio: start, end, and BOTH have distinct errors") {
    intercept[MissingStart](routes.findRoute("nope1", u("Polska")))
    intercept[MissingEnd](routes.findRoute(u("Polska"), "nope2"))
    val both = intercept[MissingBoth](routes.findRoute("nope1", "nope2"))
    assert(both.startUrl == "nope1" && both.endUrl == "nope2")
    // distributed path agrees
    intercept[MissingBoth](routes.findRouteDistributed("nope1", "nope2"))
  }
}
