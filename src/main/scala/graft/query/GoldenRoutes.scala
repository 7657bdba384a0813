package graft.query

/**
 * Frozen golden route table — the working analog of the reference's dormant
 * expected-length harness (`Benchmarking.java:87-138`: a static
 * (start, end, expectedRouteSize) array checked by `runBenchmarksAndTest`,
 * never invoked by its CLI). Frozen for the DETERMINISTIC `synth:2000`
 * corpus (avgDeg 8, seed 42 — exactly what `Cli convert --input synth:2000`
 * builds), 50 pairs seeded from 0xcafebabe over the live (post-redirect-
 * elimination) url set; expected value is the ROUTE SIZE in pages, 0 = no
 * route, matching the reference's `getRoute().size()` convention. Expected
 * sizes were computed by the independent driver-side oracle
 * (GoldenRoutesSpec's redirect-chain + BFS reimplementation), so the table
 * cross-checks the whole engine: distributed build, id dictionary,
 * adjacency, bidirectional BFS, path reconstruction.
 *
 * Gated continuously in RoutesSpec and runnable operationally via
 * `Cli benchmark --input <synth:2000 warehouse> --test`.
 */
object GoldenRoutes {

  /** The corpus the table is frozen for. */
  val CorpusSpec = "synth:2000"

  val Table: Seq[(String, String, Int)] = Seq(
    ("https://synth.example/wiki/p37b74c-103", "https://synth.example/wiki/pf84641-1610", 5),
    ("https://synth.example/wiki/p44ca58-559", "https://synth.example/wiki/pe56f1d-1895", 6),
    ("https://synth.example/wiki/p2588a3-864", "https://synth.example/wiki/pffde6d-222", 5),
    ("https://synth.example/wiki/p3f58be-1759", "https://synth.example/wiki/paec797-1616", 6),
    ("https://synth.example/wiki/pa1085b-705", "https://synth.example/wiki/p0a866d-560", 5),
    ("https://synth.example/wiki/p851a4f-292", "https://synth.example/wiki/p4a1393-745", 6),
    ("https://synth.example/wiki/p4372b7-1948", "https://synth.example/wiki/p9fe29d-825", 5),
    ("https://synth.example/wiki/p60bc4e-510", "https://synth.example/wiki/pe76d11-1524", 4),
    ("https://synth.example/wiki/p2e377c-691", "https://synth.example/wiki/p4f9ca9-326", 5),
    ("https://synth.example/wiki/p6a64b3-552", "https://synth.example/wiki/p32ec1d-1398", 5),
    ("https://synth.example/wiki/p46b8d1-1658", "https://synth.example/wiki/pd99abe-867", 4),
    ("https://synth.example/wiki/p55389a-1554", "https://synth.example/wiki/p4edbbe-906", 5),
    ("https://synth.example/wiki/pc40080-186", "https://synth.example/wiki/pe235fd-915", 6),
    ("https://synth.example/wiki/pc36a48-1623", "https://synth.example/wiki/pf9f7fc-790", 5),
    ("https://synth.example/wiki/p2588a3-864", "https://synth.example/wiki/p0361c0-566", 4),
    ("https://synth.example/wiki/pbfee59-1431", "https://synth.example/wiki/pb326ba-1148", 6),
    ("https://synth.example/wiki/p9ab591-1879", "https://synth.example/wiki/pfa274c-1324", 5),
    ("https://synth.example/wiki/pd71ffe-1410", "https://synth.example/wiki/pf7cfef-314", 6),
    ("https://synth.example/wiki/paa7982-1845", "https://synth.example/wiki/p799898-1790", 6),
    ("https://synth.example/wiki/pea91dd-1493", "https://synth.example/wiki/p83334f-561", 5),
    ("https://synth.example/wiki/pcfc70f-747", "https://synth.example/wiki/p412367-1988", 6),
    ("https://synth.example/wiki/p7a5058-459", "https://synth.example/wiki/p07bb86-57", 4),
    ("https://synth.example/wiki/p09ae38-290", "https://synth.example/wiki/p387a86-106", 5),
    ("https://synth.example/wiki/pe17560-1309", "https://synth.example/wiki/p62d7e1-937", 6),
    ("https://synth.example/wiki/p4b793d-429", "https://synth.example/wiki/pa9d160-931", 6),
    ("https://synth.example/wiki/p877894-33", "https://synth.example/wiki/p8fadc5-601", 6),
    ("https://synth.example/wiki/p8d90e0-971", "https://synth.example/wiki/p8d474c-152", 5),
    ("https://synth.example/wiki/pb0f91d-141", "https://synth.example/wiki/p94b31f-457", 4),
    ("https://synth.example/wiki/p4b903f-360", "https://synth.example/wiki/pe7f44f-1307", 4),
    ("https://synth.example/wiki/pc50814-291", "https://synth.example/wiki/p0700ab-1250", 5),
    ("https://synth.example/wiki/p432d6b-1224", "https://synth.example/wiki/p11a25d-1798", 4),
    ("https://synth.example/wiki/p12c708-1055", "https://synth.example/wiki/pacbe3e-1165", 6),
    ("https://synth.example/wiki/pb76a6c-289", "https://synth.example/wiki/p62403e-366", 4),
    ("https://synth.example/wiki/p81f492-1763", "https://synth.example/wiki/pda54f7-1602", 7),
    ("https://synth.example/wiki/pd87d39-1846", "https://synth.example/wiki/p84cd8b-1330", 6),
    ("https://synth.example/wiki/pff9596-753", "https://synth.example/wiki/pe3651b-1235", 3),
    ("https://synth.example/wiki/p9a2018-300", "https://synth.example/wiki/p412367-1988", 5),
    ("https://synth.example/wiki/p62fdd6-498", "https://synth.example/wiki/pd90838-27", 4),
    ("https://synth.example/wiki/p614d43-967", "https://synth.example/wiki/p37b011-899", 6),
    ("https://synth.example/wiki/p21021f-689", "https://synth.example/wiki/pff2328-733", 6),
    ("https://synth.example/wiki/p30a8e9-797", "https://synth.example/wiki/p287dc0-1593", 6),
    ("https://synth.example/wiki/p3335ee-424", "https://synth.example/wiki/pe59087-803", 6),
    ("https://synth.example/wiki/pe63d3c-1905", "https://synth.example/wiki/p6a64b3-552", 4),
    ("https://synth.example/wiki/pd6db46-1947", "https://synth.example/wiki/p0dea49-346", 3),
    ("https://synth.example/wiki/pb1a1d6-1459", "https://synth.example/wiki/p230040-1400", 5),
    ("https://synth.example/wiki/pf4546d-1589", "https://synth.example/wiki/p684c42-1332", 7),
    ("https://synth.example/wiki/p40b4ad-92", "https://synth.example/wiki/pb53219-1980", 0),
    ("https://synth.example/wiki/p943cdb-265", "https://synth.example/wiki/p63c430-52", 5),
    ("https://synth.example/wiki/pbf20e7-870", "https://synth.example/wiki/pdfa34d-411", 5),
    ("https://synth.example/wiki/p8797ce-1437", "https://synth.example/wiki/pe26b11-1888", 5))

  /** Run every golden pair; prints one status line per route and a summary.
    * Returns the number of failures (0 = the engine reproduces the frozen
    * expectations exactly). */
  def run(routes: Routes, out: java.io.PrintStream): Int = {
    var failures = 0
    val times = Table.map { case (a, b, want) =>
      val t0 = System.nanoTime()
      val got = routes.findRoute(a, b).size
      val ms = (System.nanoTime() - t0) / 1e6
      val ok = got == want
      if (!ok) failures += 1
      out.println(f"route $a -> $b: size $got ($want expected) " +
        f"($ms%.1f ms) [${if (ok) "OK" else "FAIL"}]")
      ms
    }
    val mean = times.sum / times.size
    out.println(f"Runs=${times.size} Min=${times.min}%.1f Max=${times.max}%.1f " +
      f"Mean=$mean%.1f Sum=${times.sum}%.1f (ms) Failures=$failures")
    failures
  }
}
