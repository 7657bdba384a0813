package graft.ingest

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests freezing the byte-identical-per-url invariant surface
  * (FIXTURES.md §4 "extraction goldens"). Any change to these bytes is a
  * breaking change to Extract.Version. */
class ExtractSpec extends AnyFunSuite {

  private def hex(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map(b => f"$b%02x").mkString

  test("extractText: tags stripped, whitespace collapsed, entities decoded") {
    val html = "<html><body><h1>Hello</h1>\n  <p>a &amp; b &lt;c&gt;   d</p></body></html>"
    assert(Extract.extractText(html) == "Hello a & b <c> d")
  }

  test("extractText: script and style bodies dropped") {
    val html = "<p>keep</p><script>var drop = 1 < 2;</script><style>p{}</style><p>tail</p>"
    assert(Extract.extractText(html) == "keep tail")
  }

  test("extractText: golden bytes stay frozen") {
    // goldens guard the exact bytes, incl. entity/whitespace edge cases
    val cases = Seq(
      "<p>a</p><p>b</p>" -> "6120 62".replace(" ", ""),
      "&nbsp;&nbsp;x&nbsp;" -> "78",
      "<P >UP</ p>lo" -> hex("UP lo"),
      "a&unknown;b" -> hex("a&unknown;b"),
      "<div>ünïcode €</div>" -> hex("ünïcode €"))
    for ((in, want) <- cases)
      assert(hex(Extract.extractText(in)) == want, s"input: $in")
  }

  test("extractText: null and empty") {
    assert(Extract.extractText(null: String) == "")
    assert(Extract.extractText(Array.empty[Byte]) == "")
  }

  test("normalizeUrl: host case, fragment, default port, trailing slash") {
    assert(Extract.normalizeUrl("HTTP://Example.COM:80/Foo/#frag") ==
      "http://example.com/Foo")
    assert(Extract.normalizeUrl("https://a.b:443/") == "https://a.b/")
    assert(Extract.normalizeUrl("https://a.b/x/") == "https://a.b/x")
    assert(Extract.normalizeUrl("https://a.b/x/Y") == "https://a.b/x/Y")
  }

  test("resolveHref: absolute, scheme-relative, root-relative, path-relative") {
    val base = "https://h.io/a/b/page.html"
    assert(Extract.resolveHref(base, "https://x.y/z") == "https://x.y/z")
    assert(Extract.resolveHref(base, "//x.y/z") == "https://x.y/z")
    assert(Extract.resolveHref(base, "/z") == "https://h.io/z")
    assert(Extract.resolveHref(base, "c.html") == "https://h.io/a/b/c.html")
    assert(Extract.resolveHref(base, "../c.html") == "https://h.io/a/c.html")
    assert(Extract.resolveHref(base, "mailto:x@y") == "")
  }

  test("extractLinks: attribute quoting styles, dedup, self-link dropped") {
    val base = "https://h.io/p"
    val html =
      """<a href="https://h.io/one">1</a> <a href='/two'>2</a>
        |<a href=three>3</a> <a href="https://h.io/one#x">dup</a>
        |<a href="https://h.io/p#self">self</a>""".stripMargin
    assert(Extract.extractLinks(html, base) ==
      Seq("https://h.io/one", "https://h.io/two", "https://h.io/three"))
  }

  test("extractLinks: dup href collapses (WikiLinksTest.kt:127-136 analog)") {
    val html = """<a href="/t">a</a><a href="/t">b</a><a href="/u">c</a>"""
    assert(Extract.extractLinks(html, "https://h.io/p") ==
      Seq("https://h.io/t", "https://h.io/u"))
  }

  test("extractRedirect: canonical, refresh, self-canonical is not a redirect") {
    val base = "https://h.io/p"
    assert(Extract.extractRedirect(
      """<link rel="canonical" href="https://h.io/q">""", base) ==
      Some("https://h.io/q"))
    assert(Extract.extractRedirect(
      """<link href="https://h.io/q" rel=canonical>""", base) ==
      Some("https://h.io/q"))
    assert(Extract.extractRedirect(
      """<meta http-equiv="refresh" content="0;url=/next">""", base) ==
      Some("https://h.io/next"))
    assert(Extract.extractRedirect(
      """<link rel="canonical" href="https://h.io/p#x">""", base).isEmpty)
    assert(Extract.extractRedirect("<p>no</p>", base).isEmpty)
  }

  test("SynthCorpus text column equals extractText(html) by construction") {
    for (p <- SynthCorpus.allFixtures ++ SynthCorpus.generateLocal(50))
      assert(Extract.extractText(p.html) == p.text, p.url)
  }

  test("SynthCorpus generator is a pure function of (seed, n, id)") {
    val a = SynthCorpus.generateLocal(30, seed = 42)
    val b = SynthCorpus.generateLocal(30, seed = 42)
    assert(a.map(_.url) == b.map(_.url))
    assert(a.map(_.html.toSeq) == b.map(_.html.toSeq))
    val c = SynthCorpus.generateLocal(30, seed = 43)
    assert(a.map(_.html.toSeq) != c.map(_.html.toSeq))
  }
}
