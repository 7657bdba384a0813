package graft.plans

import graft.SparkTestBase
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions-injected optimizer rule: the portable HOF
  * cosine formulation must plan as the native codegen'd kernel, produce
  * bit-identical values, and leave non-matching shapes alone. */
class CosineRewriteSpec extends SparkTestBase {

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("portable formulation plans as the native kernel (rule injected)") {
    import spark.implicits._
    val q = embs.select($"vec_id",
      Similarity.cosinePortable($"embedding", $"embedding").as("c"))
    val plan = planOf(q)
    assert(plan.contains("cosine_similarity"),
      s"expected the kernel in the rewritten plan:\n$plan")
    assert(!plan.contains("zip_with"), s"HOF survived the rewrite:\n$plan")
    // and the rewrite changed nothing numerically: self-cosine == 1.0 ± fp
    assert(q.select($"c").as[Double].collect().forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("rewritten values are bitwise-equal to the unrewritten formulation") {
    import spark.implicits._
    val expr = Similarity.cosinePortable($"va", $"vb").as("c")
    val pairs = embs.select($"vec_id".as("a"), $"embedding".as("va"))
      .crossJoin(embs.select($"vec_id".as("b"), $"embedding".as("vb")))
      .filter($"a" < $"b" && $"a" < 20)
    val rewritten = pairs.select($"a", $"b", expr)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.CosineRewrite")
    val plain =
      try pairs.select($"a", $"b", expr)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(rewritten.length == plain.length && rewritten.nonEmpty)
    rewritten.zip(plain).foreach { case ((a1, b1, c1), (a2, b2, c2)) =>
      assert(a1 == a2 && b1 == b2)
      assert(java.lang.Double.doubleToLongBits(c1) ==
        java.lang.Double.doubleToLongBits(c2), s"pair ($a1,$b1)")
    }
  }

  test("zero-norm / empty arrays follow Divide: ANSI throws, legacy NULL") {
    import graft.functions.CosineSimilarity.{cosine_similarity, cosine_similarity_lenient}
    import spark.implicits._
    def chain(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .map(t => String.valueOf(t.getMessage)).toSeq
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array.empty[Float], Array.empty[Float])).toDF("va", "vb")
    // ANSI (the Spark 4 session default): the PORTABLE formulation — whose
    // Divide the rewrite substitutes, so error parity is the contract —
    // raises DIVIDE_BY_ZERO both through the rewritten kernel and the
    // strict Column binding; the kernel must never leak an IEEE NaN instead
    val pErr = intercept[Exception] {
      df.select(Similarity.cosinePortable($"va", $"vb")).collect() }
    assert(chain(pErr).exists(_.contains("DIVIDE_BY_ZERO")), chain(pErr).mkString(" | "))
    val kErr = intercept[Exception] {
      df.select(cosine_similarity($"va", $"vb")).collect() }
    assert(chain(kErr).exists(_.contains("DIVIDE_BY_ZERO")), chain(kErr).mkString(" | "))
    // the LENIENT binding (Similarity.cosine — internal ANN/bucketing
    // kernels) is NULL even under ANSI: one degenerate vector in a corpus
    // must not abort a bucketing job
    val len = df.select(cosine_similarity_lenient($"va", $"vb").as("c")).collect()
    assert(len.forall(_.isNullAt(0)), s"lenient must be NULL, got ${len.mkString(",")}")
    // legacy mode: Divide's null-on-zero-divisor, bit-identically NULL on
    // both paths (columns built AFTER the conf flip so failOnError=false)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val k = df.select(cosine_similarity($"va", $"vb").as("c")).collect()
      val p = df.select(Similarity.cosinePortable($"va", $"vb").as("c")).collect()
      assert(k.forall(_.isNullAt(0)), s"kernel must be NULL, got ${k.mkString(",")}")
      assert(p.forall(_.isNullAt(0)), s"portable must be NULL, got ${p.mkString(",")}")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("one zero or NULL vector does not abort ANN bucketing/ranking/near-dup jobs") {
    import spark.implicits._
    val withZero = embs.select($"vec_id", $"embedding").limit(20)
      .union(Seq((9999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
      .union(Seq((9998L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    // all three pipelines complete under the default-ANSI session; the
    // degenerate vectors simply never rank (NULL scores are skipped; a NULL
    // embedding passes the lshBucket dim guard and lands in bucket 0)
    val bf = Similarity.bruteForceTopK(withZero, "vec_id", "embedding",
      Seq(0L, 9999L), k = 3).collect()
    assert(bf.nonEmpty && !bf.exists(r => r.getLong(2) == 9999L || r.getLong(2) == 9998L),
      "degenerate vectors must not appear as neighbors")
    assert(Similarity.lshTopK(withZero, "vec_id", "embedding", Seq(0L),
      k = 3, planes = 4).count() > 0)
    Similarity.embeddingNearDupPairs(withZero, "vec_id", "embedding",
      threshold = 0.45, blocks = 4).collect() // completes, no throw
    // a MIS-SIZED (non-null) embedding is a data bug, not a degenerate row:
    // the in-scan dim guard must still abort rather than mis-bucket
    val ragged = withZero
      .union(Seq((9997L, Array.fill(3)(1.0f))).toDF("vec_id", "embedding"))
    val e = intercept[Exception] {
      Similarity.lshBucket(ragged, "vec_id", "embedding", planes = 4, dim = 64).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e).exists(m => m != null && m.contains("lshBucket: dim=64")))
  }

  test("non-matching shapes are left alone (conservative match)") {
    import spark.implicits._
    // double arrays: the cast-to-double nodes the matcher requires are
    // elided, so the formulation must NOT be rewritten (the kernel only
    // accepts array<float>)
    val doubles = spark.range(4).select(
      array(col("id").cast("double"), lit(1.0)).as("a"),
      array(lit(2.0), col("id").cast("double")).as("b"))
    val dot = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform($"a", x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform($"b", x => x * x), lit(0.0), (s, v) => s + v))
    val q = doubles.select((dot / (na * nb)).as("c"))
    assert(!planOf(q).contains("cosine_similarity"))
    q.collect() // and it still executes
  }
}
