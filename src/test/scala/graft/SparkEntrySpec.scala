package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke tests at sf0.001: entry() answers the golden route;
  * every declared query runs and every oracle key has a query. */
class SparkEntrySpec extends SparkTestBase {

  test("entry: flagship route is the golden [Gdansk, Polska]") {
    import spark.implicits._
    val rows = SparkEntry.entry(spark).orderBy($"pos")
      .as[(Int, String)].collect().toSeq
    assert(rows == Seq(
      0 -> graft.ingest.SynthCorpus.urlOf("Gdansk"),
      1 -> graft.ingest.SynthCorpus.urlOf("Polska")))
  }

  test("oracleSql keys are a subset of queries; aliases are sane") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
    assert((qs -- os).forall(_.startsWith("x_")),
      "non-oracle queries must use the x_ prefix: " + (qs -- os -- os))
  }

  test("every query executes at sf0.001 with deterministic row counts") {
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries) {
      val c1 = fn(spark, dir).count()
      val c2 = fn(spark, dir).count()
      assert(c1 == c2, s"$name row count unstable: $c1 vs $c2")
    }
  }
}
