package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (suites run forked in a
  * single JVM; a per-suite session would thrash SparkContext). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(cores = 8, shufflePartitions = 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
}
