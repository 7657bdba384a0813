package graft.query

import java.io.{BufferedReader, PrintStream}

/**
 * Interactive stdin query loop — behavior parity with the reference's
 * interactive mode (`Main.kt:283-339` `doInteractiveSegment` /
 * `findTargetSegment`, `Interactive.kt:52-95`):
 *
 *   - `<prefix>#`  wildcard: list up to 10 articles starting with prefix
 *   - `<`          random article (seeded rng injectable for tests)
 *   - `#` alone    rejected (wildcard needs at least one char)
 *   - exact name   accepted iff the page exists, else a hint
 *   - EOF          exits the loop
 *
 * Endpoints are validated at the prompt (so routing errors inside the loop
 * can only be "no route"), mirroring the reference; the one-shot CLI path
 * surfaces the MissingStart/MissingEnd/MissingBoth trio instead.
 *
 * Takes reader/printer/seed as parameters so a scripted-stdin test can
 * drive the exact loop the user sees.
 */
object Interactive {

  private def quote(s: String) = "\"" + s + "\""

  def run(routes: Routes, in: BufferedReader, out: PrintStream,
      seed: Long = 0xcafebabeL): Unit = {
    val rng = new java.util.Random(seed)
    out.println("Starting interactive mode ('<' for random article, '#' for wildcard, EOF to quit)")
    var continue = true
    while (continue) {
      val picked = for {
        start <- findTarget(routes, in, out, rng, startPoint = true)
        end <- findTarget(routes, in, out, rng, startPoint = false)
      } yield (start, end)
      picked match {
        case None => continue = false
        case Some((start, end)) =>
          val t0 = System.nanoTime()
          val route = routes.findRoute(start, end) // endpoints pre-validated
          val ms = (System.nanoTime() - t0) / 1000000
          val msg =
            if (route.isEmpty) s"No route found between ${quote(start)} and ${quote(end)}"
            else "Route: " + route.map(quote).mkString(" -> ")
          out.println(s"$msg (in $ms ms)")
      }
    }
  }

  /** One endpoint prompt: loops until a valid page name (typed, via
    * wildcard exploration, or random), or None on EOF. */
  private def findTarget(routes: Routes, in: BufferedReader, out: PrintStream,
      rng: java.util.Random, startPoint: Boolean): Option[String] = {
    val which = if (startPoint) "starting" else "end"
    out.println(s"Please type the $which article ('<' for random article and '#' for wildcard)")
    while (true) {
      out.print("> ")
      val line = in.readLine()
      if (line == null) return None
      val trimmed = line.trim
      if (trimmed == "#") {
        out.println("Must have at least one char before the wildcard")
      } else if (trimmed.endsWith("#")) {
        val prefix = trimmed.dropRight(1)
        // driver-index binary search on interactive graphs (no Spark job)
        val matches = routes.prefixSearch(prefix, 10)
        if (matches.isEmpty)
          out.println(s"No articles start with ${quote(prefix)}")
        else
          out.println(s"At least these articles start with ${quote(prefix)}: " +
            matches.mkString(", "))
      } else if (trimmed == "<") {
        routes.randomUrl(rng.nextLong()) match {
          case Some(u) =>
            out.println(s"Selected ${quote(u)} as $which page")
            return Some(u)
          case None => out.println("No pages in this graph")
        }
      } else if (trimmed.nonEmpty && routes.hasPage(trimmed)) {
        return Some(trimmed)
      } else {
        out.println(s"No page with name ${quote(trimmed)} found. Try wildcards?")
      }
    }
    None // unreachable
  }
}
