package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the formatted physical plan of named queries — the evidence
  * artifact PLANS.md quotes. Usage:
  *
  *   sbt "runMain graft.tools.PlanDump q55 q57 q61" [SPARK_GRAFT_SF_DIR]
  *
  * Prefix-matches query names (like the bench's ONLY knob).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val prefixes = if (args.nonEmpty) args.toSeq else Seq("q")
    val spark = GraftSession(appName = "graft-plandump")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    spark.stop()
  }
}
