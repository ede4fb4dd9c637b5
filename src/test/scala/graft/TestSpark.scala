package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (ScalaTest guidance in the
  * project build: a session per suite is wasteful; tests are read-only). */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession(master = "local[4]", shufflePartitions = Some(4),
      appName = "graft-test")
}
