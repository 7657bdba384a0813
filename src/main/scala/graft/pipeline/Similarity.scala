package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - [[cosine]]: codegen'd column expression (zip_with + aggregate), doubles
 *    throughout for cross-engine reproducibility
 *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
 *    rank per query with a window; ranking key is round(cos,6) then id so
 *    float noise can't flip orders across engines
 *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets (planes are
 *    a pure function of (seed, plane, dim): no data-dependent state), search
 *    only the query's bucket ± optional multi-probe; recall measured vs
 *    brute force in tests
 */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Native codegen'd kernel ([[graft.functions.CosineSimilarity]]) —
    * bit-identical to [[cosinePortable]] (same double left-fold), minus the
    * higher-order-function interpretation overhead in the ANN hot path. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_similarity(a, b)

  /** Built-ins-only formulation (zip_with + aggregate): the portable
    * reference semantics the native kernel must match exactly. */
  def cosinePortable(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /**
   * Exact top-k neighbors for each query id. `queries` is a subset of
   * `vectors` by id (typical eval shape). Output: (q, rank, neighbor).
   * Self-matches excluded.
   */
  def bruteForceTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qs = broadcast(vectors
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("q"), col(vecCol).as("qv")))
    val scored = vectors.join(qs, col(idCol) =!= $"q")
      .select($"q", col(idCol).as("neighbor"),
        round(cosine($"qv", col(vecCol)), 6).as("cos"))
    val w = Window.partitionBy($"q").orderBy($"cos".desc, $"neighbor")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q", $"rank", $"neighbor", $"cos")
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane, dim):
    * ±1 from splitmix64 parity — cheap, portable, and broadcastable. */
  private def planeSign(seed: Long, plane: Int, dim: Int): Double = {
    val h = graft.ingest.SynthCorpus.mix64(seed ^ (plane.toLong << 32) ^ dim.toLong)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Random-hyperplane signature: `planes`-bit bucket id per vector. */
  def lshBucket(vectors: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val dim = vectors.select(size(col(vecCol))).first().getInt(0)
    val planeCols = (0 until planes).map { p =>
      // sign(dot) == sign(cosine): reuse the native codegen'd kernel
      val signs = array((0 until dim).map(d =>
        lit(planeSign(seed, p, d).toFloat)): _*)
      val side = graft.functions.CosineSimilarity
        .cosine_similarity(col(vecCol), signs) >= 0
      when(side, lit(1L << p)).otherwise(lit(0L))
    }
    vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
      planeCols.reduce(_.bitwiseOR(_)).as("bucket"))
  }

  /**
   * Approximate top-k: candidates restricted to vectors whose LSH bucket is
   * within `probeHamming` bits of the query's bucket (multi-probe), then
   * exact cosine rank within candidates. Cuts the scanned fraction to
   * ~Σ_{i≤probe} C(planes,i)/2^planes of the corpus.
   */
  def lshTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 10, planes: Int = 8,
      probeHamming: Int = 1, seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bucketed = lshBucket(vectors, idCol, vecCol, planes, seed).persist()
    val qs = broadcast(bucketed.filter($"id".isin(queryIds: _*))
      .select($"id".as("q"), $"vec".as("qv"), $"bucket".as("qb")))
    val cand = bucketed.join(qs,
      ($"id" =!= $"q") &&
        (bit_count($"bucket".bitwiseXOR($"qb")) <= probeHamming))
    val w = Window.partitionBy($"q").orderBy($"cos".desc, $"neighbor")
    cand.select($"q", $"id".as("neighbor"),
        round(cosine($"qv", $"vec"), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q", $"rank", $"neighbor", $"cos")
  }

  // ---------------------------------------------------------------------------
  // IVF-lite: the other standard ANN scale path (coarse quantizer + probes)
  // ---------------------------------------------------------------------------

  /** Deterministic coarse centroids: the vectors whose ids hash lowest under
    * the seed (data-independent, reproducible at any parallelism; a real IVF
    * would k-means these — the assignment/probe machinery is identical). */
  private def centroids(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    vectors
      .withColumn("__h", xxhash64(col(idCol), lit(seed)))
      .withColumn("__r", row_number().over(Window.orderBy(col("__h"), col(idCol))))
      .filter(col("__r") <= nlist)
      .select(col("__r").as("cell"), col(vecCol).as("cvec"))
  }

  /** Assign every vector to its nearest centroid (one broadcast pass). */
  def ivfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cs = broadcast(centroids(vectors, idCol, vecCol, nlist, seed))
    val w = Window.partitionBy(col(idCol)).orderBy($"__sim".desc, $"cell")
    vectors.join(cs)
      .withColumn("__sim", cosine(col(vecCol), $"cvec"))
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), $"cell")
  }

  /** IVF top-k: probe the query's `nprobe` nearest cells, rank exactly
    * within them. Scanned fraction ≈ nprobe/nlist of the corpus. */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val indexed = ivfIndex(vectors, idCol, vecCol, nlist, seed).persist()
    val cs = broadcast(centroids(vectors, idCol, vecCol, nlist, seed))
    val qs = indexed.filter($"id".isin(queryIds: _*))
      .select($"id".as("q"), $"vec".as("qv"))
    val wCells = Window.partitionBy($"q").orderBy($"__sim".desc, $"cell")
    val probed = broadcast(qs.join(cs)
      .withColumn("__sim", cosine($"qv", $"cvec"))
      .withColumn("__rn", row_number().over(wCells))
      .filter($"__rn" <= nprobe)
      .select($"q", $"qv", $"cell"))
    val wRank = Window.partitionBy($"q").orderBy($"cos".desc, $"neighbor")
    indexed.join(probed, Seq("cell"))
      .filter($"id" =!= $"q")
      .select($"q", $"id".as("neighbor"),
        round(cosine($"qv", $"vec"), 6).as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= k)
      .select($"q", $"rank", $"neighbor", $"cos")
  }

  /** Embedding-cosine near-duplicate pairs (a<b, cos ≥ threshold). Exact
    * variant; at scale restrict to shared LSH buckets first. */
  def embeddingNearDupPairs(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, useLsh: Boolean = false,
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    if (!useLsh) {
      val l = vectors.select(col(idCol).as("a"), col(vecCol).as("va"))
      val r = vectors.select(col(idCol).as("b"), col(vecCol).as("vb"))
      l.join(r, $"a" < $"b")
        .filter(round(cosine($"va", $"vb"), 6) >= threshold)
        .select($"a", $"b")
    } else {
      val bucketed = lshBucket(vectors, idCol, vecCol, planes, seed)
      val l = bucketed.select($"id".as("a"), $"vec".as("va"), $"bucket")
      val r = bucketed.select($"id".as("b"), $"vec".as("vb"), $"bucket")
      l.join(r, Seq("bucket")).filter($"a" < $"b")
        .filter(round(cosine($"va", $"vb"), 6) >= threshold)
        .select($"a", $"b").distinct()
    }
  }
}
