package graft

import org.apache.spark.sql.SparkSession

/** Factory for a tuned local SparkSession. On a cluster the same settings
  * arrive via spark-submit confs; nothing here is local-mode-specific except
  * the master default. */
object GraftSession {

  def builder(cores: Int = 32, shufflePartitions: Int = -1): SparkSession.Builder = {
    val sp = if (shufflePartitions > 0) shufflePartitions else math.max(cores, 8)
    val b = SparkSession.builder()
    // spark-submit propagates --master as the spark.master property; only
    // default to local[] when launched bare (sbt run / tests) so a cluster
    // submission's --master yarn/k8s is never clobbered
    if (!sys.props.contains("spark.master")) b.master(s"local[$cores]")
    // Catalyst plug-ins (portable-cosine → native-kernel rewrite); the same
    // class loads on a cluster via --conf spark.sql.extensions
    b.withExtensions(new graft.plans.GraftExtensions())
    // default the catalog warehouse off the repo cwd (bucketed tables land
    // here in local mode); a submitted --conf always wins
    if (!sys.props.contains("spark.sql.warehouse.dir"))
      b.config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft-warehouse")
    b.appName("graft")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // local mode: shuffle files on tmpfs — one box has no per-node disks,
      // so keep shuffle I/O off the root device (a real cluster would use
      // per-executor local SSDs)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
  }

  def get(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
