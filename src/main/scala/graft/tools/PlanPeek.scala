package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev aid: print the executed plan of named checked queries (the
  * `.explain`-and-iterate loop the plan audits then pin). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession(appName = "graft-plan-peek")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString.take(5000))
    }
    spark.stop()
  }
}
