package graft.graph

import java.nio.file.Files

import graft.SparkTestBase
import graft.ingest.SynthGraph

/** Bucketed co-location: a join between two tables bucketed on the join key
  * and an aggregation on the bucket key must run with NO Exchange — the
  * physical property a 1000-executor PageRank superstep relies on to never
  * re-shuffle the edge side. Results must equal the unbucketed plans. */
class BucketedSpec extends SparkTestBase {

  test("bucketed-on-src join and groupBy(src) elide every Exchange") {
    import spark.implicits._
    val edges = SynthGraph.edges(spark, vertices = 500, count = 4000).distinct()
    val deg = EdgeTable.degrees(edges, "src")
      .select($"id".as("src"), $"degree")

    val base = Files.createTempDirectory("graft-bucketed").toString
    EdgeTable.saveBucketed(edges.toDF(), "edges_b", "src", s"$base/edges_b", buckets = 8)
    EdgeTable.saveBucketed(deg, "deg_b", "src", s"$base/deg_b", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val eb = spark.table("edges_b")
      val db = spark.table("deg_b")

      // big-against-big shape: disable the broadcast shortcut (at scale both
      // sides are too large to broadcast — that is when bucketing matters)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = eb.join(db, "src")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$joinPlan")
      assert(joinPlan.contains("Bucketed: true"),
        s"planner must actually use the bucket spec:\n$joinPlan")
      // same rows as the unbucketed join
      assert(joined.count() ==
        edges.toDF().join(deg, "src").count())

      // aggregation on the bucket key: partial+final with no Exchange between
      val agg = eb.groupBy($"src").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy(bucket key) must not shuffle:\n$aggPlan")
      assert(agg.count() == edges.select($"src").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS edges_b")
      spark.sql("DROP TABLE IF EXISTS deg_b")
    }
  }
}
