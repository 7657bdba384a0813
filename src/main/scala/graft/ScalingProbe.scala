package graft

import org.apache.spark.storage.StorageLevel

import graft.algo.PageRank
import graft.ingest.SynthGraph

/** Scaling diagnostics: PageRank superstep throughput across core counts
  * (`runMain graft.ScalingProbe 2 4 8 16 32`). Informs the N/4N pair used
  * for the BASELINE.md scaling evidence. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val coreList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 8, 32)
    val vertices = sys.env.getOrElse("PROBE_V", "1000000").toLong
    val edgeCount = sys.env.getOrElse("PROBE_E", "16000000").toLong
    val iters = sys.env.getOrElse("PROBE_I", "5").toInt
    val sp = sys.env.getOrElse("PROBE_SP", "-1").toInt
    for (cores <- coreList) {
      val spark = GraftSession.builder(cores, shufflePartitions = sp).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      // JIT warmup on a small graph (does not pollute the block-manager
      // with a full-size cached copy)
      val wEdges = SynthGraph.edges(spark, vertices / 16, edgeCount / 16, seed = 7L)
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      PageRank.run(spark.range(vertices / 16).toDF("id"), wEdges, tol = 0.0, maxIter = 2)
      wEdges.unpersist()

      val edges = SynthGraph.edges(spark, vertices, edgeCount)
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val e = edges.count()
      val verts = spark.range(vertices).toDF("id")
      val res = PageRank.run(verts, edges, tol = 0.0, maxIter = iters)
      val stepSecs = res.metrics.map(_.wallMs / 1e3).sorted
      val median = stepSecs(stepSecs.size / 2)
      val thr = e.toDouble / median
      val thrMin = e.toDouble / stepSecs.min
      println(f"PROBE cores=$cores%2d sp=$sp%d medianStepSecs=$median%.2f throughputMedian=$thr%.0f throughputMin=$thrMin%.0f edges/s perStepMs=${res.metrics.map(_.wallMs).mkString(",")}")
      spark.stop()
    }
  }
}
