package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.graph.Edge

/**
 * Direct synthetic edge-table generator for algorithm benchmarks: each edge
 * is a pure function of its index (seed-pure, parallelism-invariant), with
 * the same Zipf-ish in-degree skew as [[SynthCorpus.pageFor]] — low vertex
 * ids are hubs. Used where the benchmark should measure the ALGORITHM, not
 * corpus ETL.
 */
object SynthGraph {

  def edgeFor(i: Long, vertices: Long, seed: Long): Edge = {
    val h1 = SynthCorpus.mix64(seed ^ (i * 0x9E3779B97F4A7C15L))
    val h2 = SynthCorpus.mix64(h1 + 0x632BE59BD9B4E019L)
    val src = (math.abs(h1) % vertices)
    // skewed dst: squared-uniform pulls toward 0 (hubs), 1/4 uniform tail
    val u = (h2 >>> 11).toDouble / (1L << 53).toDouble
    val dst0 =
      if ((h2 & 3L) == 0L) math.abs(SynthCorpus.mix64(h2)) % vertices
      else (u * u * vertices).toLong.min(vertices - 1)
    val dst = if (dst0 == src) (dst0 + 1) % vertices else dst0
    Edge(src, dst)
  }

  /** `count` edges over `vertices` vertices (duplicates possible; callers
    * needing set semantics apply `.distinct()`). */
  def edges(spark: SparkSession, vertices: Long, count: Long, seed: Long = 42L,
      numPartitions: Int = 0): Dataset[Edge] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, count, 1, parts).map(i => edgeFor(i, vertices, seed))
  }
}
