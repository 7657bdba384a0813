package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ingest.Extract
import graft.pipeline.{Dedup, Multimodal, Similarity}
import graft.query.Routes

/**
 * Property-based tests (ScalaCheck) over the engine's pure kernels — the
 * functions whose correctness the distributed operators inherit. These run
 * without a SparkSession, so they cover input spaces the fixture corpora
 * never reach (unicode edge cases, hostile byte strings, arbitrary ids).
 */
object KernelProperties extends Properties("kernels") {

  // ---------------------------------------------------------------------------
  // generators
  // ---------------------------------------------------------------------------

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6)))
    slash <- Gen.oneOf("", "/")
    frag <- Gen.oneOf("", "#x", "#sec/2")
  } yield s"$scheme://$host$port" +
    (if (segs.isEmpty) slash else segs.mkString("/", "/", slash)) + frag

  private val hrefGen: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),           // relative
    Gen.nonEmptyListOf(Gen.alphaNumChar).map("/" + _.mkString),     // root-rel
    Gen.nonEmptyListOf(Gen.alphaNumChar).map("//" + _.mkString),    // scheme-rel
    urlGen,                                                          // absolute
    Gen.oneOf("#frag", "mailto:x@y", "javascript:void(0)", "", "../a/./b"))

  /** Valid unicode strings (no unpaired surrogates — UTF-8 encoding is then
    * injective, which several properties rely on). */
  private val unicodeGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(0x20, 0x7E),
      3 -> Gen.choose(0xA0, 0xD7FF),
      1 -> Gen.choose(0x10000, 0x10FFF)))
      .map(_.flatMap(cp => Character.toChars(cp).toSeq).mkString)

  private def sign(i: Int): Int = Integer.signum(i)

  // ---------------------------------------------------------------------------
  // url canonicalization (the graph's join key)
  // ---------------------------------------------------------------------------

  property("normalizeUrl is idempotent") = Prop.forAll(urlGen) { u =>
    val once = Extract.normalizeUrl(u)
    Extract.normalizeUrl(once) == once
  }

  property("normalizeUrl strips fragments, never throws on junk") =
    Prop.forAll(Gen.oneOf(urlGen, unicodeGen)) { u =>
      !Extract.normalizeUrl(u).contains("#")
    }

  property("resolveHref yields absolute-or-empty against an absolute base") =
    Prop.forAll(urlGen, hrefGen) { (base, href) =>
      val r = Extract.resolveHref(Extract.normalizeUrl(base), href)
      r.isEmpty || r.contains("://")
    }

  // ---------------------------------------------------------------------------
  // link extraction (the NORMATIVE byte-identical surface)
  // ---------------------------------------------------------------------------

  private val htmlGen: Gen[(String, String)] = for {
    base <- urlGen.map(Extract.normalizeUrl)
    hrefs <- Gen.listOf(hrefGen)
    junk <- Gen.oneOf("", "<p>text</p>", "<a href=", "<<<>>>", "<a >no href</a>")
  } yield (base,
    "<html><body>" + junk +
      hrefs.map(h => s"""<a href="$h">x</a>""").mkString + "</body></html>")

  property("extractLinks: absolute, normalized, distinct, never the page itself") =
    Prop.forAll(htmlGen) { case (base, html) =>
      val links = Extract.extractLinks(html.getBytes("UTF-8"), base)
      links.forall(l => l.nonEmpty && l.contains("://") &&
        Extract.normalizeUrl(l) == l && l != base) &&
        links.distinct == links
    }

  property("extractText: byte and string entry points agree; idempotent-safe") =
    Prop.forAll(htmlGen) { case (_, html) =>
      Extract.extractText(html.getBytes("UTF-8")) == Extract.extractText(html)
    }

  // ---------------------------------------------------------------------------
  // collation kernel behind the driver-side name index
  // ---------------------------------------------------------------------------

  property("utf8Compare: zero iff equal (UTF-8 injective on valid strings)") =
    Prop.forAll(unicodeGen, unicodeGen) { (a, b) =>
      (Routes.utf8Compare(a, b) == 0) == (a == b)
    }

  property("utf8Compare: antisymmetric and transitive") =
    Prop.forAll(unicodeGen, unicodeGen, unicodeGen) { (a, b, c) =>
      val ab = sign(Routes.utf8Compare(a, b))
      val ba = sign(Routes.utf8Compare(b, a))
      val antisym = ab == -ba
      // transitivity over the sorted triple
      val s = Seq(a, b, c).sortWith((x, y) => Routes.utf8Compare(x, y) < 0)
      val trans = Routes.utf8Compare(s(0), s(2)) <= 0
      antisym && trans
    }

  property("utf8Compare agrees with prefix order: a < a+suffix") =
    Prop.forAll(unicodeGen, unicodeGen) { (a, suf) =>
      suf.isEmpty || Routes.utf8Compare(a, a + suf) < 0
    }

  // ---------------------------------------------------------------------------
  // simhash (near-dup signature)
  // ---------------------------------------------------------------------------

  property("simhash64 is token-order invariant (bag-of-tokens semantics)") =
    Prop.forAll(Gen.listOf(Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString))) { ws =>
      Dedup.simhash64(ws.mkString(" ")) == Dedup.simhash64(ws.reverse.mkString(" "))
    }

  property("simhash64 total: null/empty/whitespace all map to 0") =
    Prop.forAll(Gen.chooseNum(0, 8)) { n =>
      Dedup.simhash64(" " * n) == 0L && Dedup.simhash64(null) == 0L
    }

  /** The original regex formulation (`trim.split("\\s+")`) that the manual
    * scanner in [[Dedup.simhash64]] replaced — per-row regex compilation
    * dominated the cold scan, but the semantics must stay bit-identical. */
  private def simhashReference(text: String): Long = {
    if (text == null) return 0L
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    for (t <- toks) {
      val h = graft.pipeline.TextAnalysis.fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Strings salted with the characters where trim (≤ U+0020, incl.
    * controls) and regex \s (exactly 6 chars) disagree. */
  private val spaceyGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r",
      "\u0001", "\u001F", "\u00A0", "\u2007", "\u3000", "\u00E9"))).map(_.mkString)

  property("simhash64 manual scanner ≡ trim.split(\"\\\\s+\") regex semantics") =
    Prop.forAll(spaceyGen) { s =>
      Dedup.simhash64(s) == simhashReference(s)
    }

  // ---------------------------------------------------------------------------
  // winnowing fingerprints
  // ---------------------------------------------------------------------------

  private val smallTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)

  property("winnow: coverage guarantee — every w-gram window holds a selection") =
    Prop.forAll(smallTextGen, Gen.chooseNum(2, 6), Gen.chooseNum(2, 8)) { (t, k, w) =>
      val n = t.length - k + 1
      val sel = graft.pipeline.TextAnalysis.winnowSeq(t, k, w)
        .map(p => (p._1 - 1).toInt).toSet
      n <= 0 || (0 until math.max(n - w + 1, 1)).forall(s =>
        (s until math.min(s + w, n)).exists(sel.contains))
    }

  property("winnow: shared substring of length ≥ k+w-1 shares a fingerprint") =
    Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr) { (a, b, core0 ) =>
      val k = 4; val w = 3
      // pad the shared passage to the theorem's minimum length
      val core = (core0 + "X" * (k + w - 1)).take(math.max(core0.length, k + w - 1))
      val d1 = a + core + b
      val d2 = b + "|" + core + "|" + a
      val f1 = graft.pipeline.TextAnalysis.winnowSeq(d1, k, w).map(_._2).toSet
      val f2 = graft.pipeline.TextAnalysis.winnowSeq(d2, k, w).map(_._2).toSet
      f1.intersect(f2).nonEmpty
    }

  property("winnow: deterministic, 1-based positions within range, total on null/short") =
    Prop.forAll(smallTextGen) { t =>
      val k = 5; val w = 4
      val s1 = graft.pipeline.TextAnalysis.winnowSeq(t, k, w)
      val n = t.length - k + 1
      s1 == graft.pipeline.TextAnalysis.winnowSeq(t, k, w) &&
        s1.forall { case (p, h) => p >= 1 && p <= math.max(n, 0) && h.length == 8 } &&
        graft.pipeline.TextAnalysis.winnowSeq(null, k, w).isEmpty &&
        (n > 0 || s1.isEmpty)
    }

  /** Quadratic reference winnow over CODE POINTS — the semantics DuckDB's
    * len/substr (character-counting) oracle implements. The deque kernel
    * must match it on any valid string, including non-BMP (astral) chars
    * where UTF-16-unit indexing would split surrogate pairs. */
  private def winnowNaive(t: String, k: Int, w: Int): Set[(Long, String)] = {
    val cps: Array[String] = t.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val n = cps.length - k + 1
    if (n <= 0) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until n).map { i =>
      md.reset()
      md.digest(cps.slice(i, i + k).mkString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString
    }
    (0 until math.max(n - w + 1, 1)).map { s =>
      val win = hs.slice(s, math.min(s + w, n))
      val m = win.min
      val sel = s + win.lastIndexOf(m) // rightmost tie
      ((sel + 1).toLong, hs(sel))
    }.toSet
  }

  private val astralTextGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.choose('a'.toInt, 'z'.toInt),
      2 -> Gen.const(' '.toInt),
      2 -> Gen.choose(0x1F600, 0x1F64F),   // emoji block (astral)
      1 -> Gen.choose(0x10000, 0x100FF)))
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)

  property("winnow: deque kernel ≡ naive code-point reference (incl. astral chars)") =
    Prop.forAll(astralTextGen, Gen.chooseNum(2, 5), Gen.chooseNum(2, 6)) { (t, k, w) =>
      graft.pipeline.TextAnalysis.winnowSeq(t, k, w).toSet == winnowNaive(t, k, w)
    }

  // ---------------------------------------------------------------------------
  // bounded top-k heap (the ANN ranking aggregate's kernel)
  // ---------------------------------------------------------------------------

  private val scoredGen: Gen[List[(Double, Long)]] = Gen.listOf(for {
    s <- Gen.chooseNum(-1.0, 1.0)
    i <- Gen.chooseNum(0L, 50L) // small id space forces score ties
  } yield (s, i))

  private def oracle(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.distinct.sortBy { case (s, i) => (-s, i) }.take(k)

  property("TopKBuffer == sort-then-take under (score desc, id asc)") =
    Prop.forAll(scoredGen, Gen.chooseNum(1, 8)) { (xs, k) =>
      val buf = new graft.functions.TopKBuffer(k)
      xs.distinct.foreach { case (s, i) => buf.insert(s, i) }
      buf.sortedBest == oracle(xs, k)
    }

  property("TopKBuffer merge ≡ combined insert (partial-agg correctness)") =
    Prop.forAll(scoredGen, scoredGen, Gen.chooseNum(1, 8)) { (xs, ys, k) =>
      val all = (xs ++ ys).distinct
      val a = new graft.functions.TopKBuffer(k)
      xs.distinct.foreach { case (s, i) => a.insert(s, i) }
      val b = new graft.functions.TopKBuffer(k)
      ys.distinct.filterNot(xs.contains).foreach { case (s, i) => b.insert(s, i) }
      b.sortedBest.foreach { case (s, i) => a.insert(s, i) } // merge = re-insert
      a.sortedBest == oracle(all, k)
    }

  // ---------------------------------------------------------------------------
  // multimodal header parsing
  // ---------------------------------------------------------------------------

  property("parseDimensions: total on arbitrary bytes (None or parsed, no throw)") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      Multimodal.parseDimensions(bs)
      true
    }

  property("fakePayload roundtrips format/dims for any doc id") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { id =>
      val parsed = Multimodal.parseDimensions(Multimodal.fakePayload(id, s"t$id"))
      parsed.contains((
        if (id % 3 == 0) "png" else "jpeg",
        64 + (id % 8).toInt * 16,
        64 + (id % 5).toInt * 16))
    }

  // ---------------------------------------------------------------------------
  // LSH probe enumeration
  // ---------------------------------------------------------------------------

  private def binom(n: Int, k: Int): Long =
    if (k < 0 || k > n) 0L
    else (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  property("probeMasks: exactly the ≤h-bit masks, distinct, Σ C(planes,i) of them") =
    Prop.forAll(Gen.choose(1, 12), Gen.choose(0, 3)) { (planes, h) =>
      val masks = Similarity.probeMasks(planes, h)
      masks.distinct.size == masks.size &&
        masks.size.toLong == (0 to h).map(binom(planes, _)).sum &&
        masks.forall(m => java.lang.Long.bitCount(m) <= h && m < (1L << planes))
    }
}
