package graft.ingest

import graft.SparkTestBase
import java.nio.charset.StandardCharsets

/** Guards two SURVEY.md claims:
  *  - O2: Spark's string ordering is unsigned-bytewise (UTF8String), i.e.
  *    the reference's title collation (`BufferWikiPage.java:134-154`)
  *  - §2.11: the extraction functions are usable from SQL, with output
  *    identical to the Column API */
class SqlSurfaceSpec extends SparkTestBase {

  test("Spark string sort order == unsigned UTF-8 bytewise order (O2 collation)") {
    import spark.implicits._
    val tricky = Seq("a", "A", "Z", "z", "~", "é", "ü", "Ä", "€x", "ÿ",
      "abc", "ab", "a b", "a-b", "ä", "😀" /* emoji */, "zz", "")
    val sparkOrder = tricky.toDF("s").orderBy($"s").as[String].collect().toSeq
    def unsignedByteCompare(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val byteOrder = tricky.sortWith(unsignedByteCompare)
    assert(sparkOrder == byteOrder)
  }

  test("SQL-registered extraction functions equal the Column API") {
    import spark.implicits._
    ExtractFunctions.register(spark)
    val page = SynthCorpus.page("SqlTest", Seq("T1", "T2"))
    val df = Seq((page.url, page.html)).toDF("url", "html")
    df.createOrReplaceTempView("raw_sql_test")
    val viaSql = spark.sql(
      """SELECT extract_text(html) AS t, extract_links(html, url) AS l,
        |       extract_redirect(html, url) AS r, normalize_url(url) AS u
        |FROM raw_sql_test""".stripMargin).collect().head
    assert(viaSql.getString(0) == page.text)
    assert(viaSql.getSeq[String](1) == Extract.extractLinks(page.html, page.url))
    assert(viaSql.isNullAt(2))
    assert(viaSql.getString(3) == Extract.normalizeUrl(page.url))
  }

  test("SQL-registered topk_by equals the Column API (custom aggregate)") {
    import spark.implicits._
    graft.functions.TopKByScore.register(spark)
    val cand = Seq(
      (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L),
      (2L, 0.5, 20L), (2L, 0.5, 21L), (2L, 0.7, 22L))
      .toDF("q", "cos", "neighbor")
    cand.createOrReplaceTempView("cand")
    val viaSql = spark.sql(
      "SELECT q, topk_by(cos, neighbor, 2) AS top FROM cand GROUP BY q")
      .selectExpr("q", "transform(top, t -> t.neighbor) AS ns")
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val viaCol = cand.groupBy($"q")
      .agg(graft.functions.TopKByScore.topk_by($"cos", $"neighbor", 2).as("top"))
      .selectExpr("q", "transform(top, t -> t.neighbor) AS ns")
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(viaSql == viaCol)
    assert(viaSql == Seq((1L, Seq(9L, 10L)), (2L, Seq(22L, 20L))))
  }
}
