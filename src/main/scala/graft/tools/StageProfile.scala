package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Per-STAGE attribution for one or more queries (optimization guide
  * §1/§7): after running each named query into the noop sink, print every
  * stage with its task count, summed task time, GC time, shuffle
  * read/write bytes, output rows, and the first line of its name — the
  * local-mode stand-in for the Spark UI's stage table. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StageProfile q189"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val prefixes = if (args.nonEmpty) args.toSeq else Seq("q")
    val spark = GraftSession(appName = "graft-stageprofile")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/nation.parquet").count()

    case class St(id: Int, name: String, tasks: Int, taskMs: Long,
                  gcMs: Long, shufR: Long, shufW: Long, rows: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.linesIterator.next(), i.numTasks,
            m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.outputMetrics.recordsWritten max
              m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    for ((name, fn) <- names) {
      Thread.sleep(500)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"===== $name wall=$wall%.2f s =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"taskS"}%8s ${"gcS"}%6s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"outRows"}%10s  name")
      stages.synchronized(stages.sortBy(-_.taskMs)).foreach { s =>
        println(f"${s.id}%6d ${s.tasks}%5d ${s.taskMs / 1e3}%8.2f ${s.gcMs / 1e3}%6.2f ${s.shufR / 1e6}%9.1f ${s.shufW / 1e6}%9.1f ${s.rows}%10d  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
