package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("saltedCount equals plain groupBy count on a hub-heavy table") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => if (i % 2 == 0) 7L else 1000L + (i % 97))
    val df = rows.toDF("k")
    val plain = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(df, "k").as[(Long, Long)].collect().toMap
    assert(plain == salted)
    assert(salted(7L) == 2500L)
  }

  test("skewAwareJoin equals a plain inner join, hub routed via broadcast") {
    import spark.implicits._
    // fact: vertex 0 is a hub with 3000 rows; tail keys have ≤5
    val fact = ((0 until 3000).map(_ => 0L) ++
      (1 until 400).flatMap(k => Seq.fill(1 + k % 5)(k.toLong)))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (0 until 400).map(k => (k.toLong, s"v$k")).toDF("id", "value")

    val plain = fact.join(dim, $"key" === $"id")
      .select($"key", $"payload", $"value")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val skew = Skew.skewAwareJoin(fact, dim, "key", "id", hubThreshold = 1000L)
      .select($"key", $"payload", $"value")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(plain == skew)
  }

  test("GraphBuilder pageFilter drops pages before extraction (P1 analog)") {
    import graft.ingest.SynthCorpus
    val corpus = SynthCorpus.chain3.map(p => p.copy(lang = "en")) ++
      Seq(SynthCorpus.page("Zz-Other", Seq("A")).copy(lang = "de"))
    val g = GraphBuilder.build(SynthCorpus.toDF(spark, corpus).toDF(),
      smallIds = true, pageFilter = col("lang") === "en")
    assert(g.pages.collect().map(_.url).toSet ==
      Set("A", "B", "C").map(SynthCorpus.urlOf))
  }
}
