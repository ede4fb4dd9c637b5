package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Attribution probe behind the bench numbers (optimization guide §1):
  * for each named query, split wall time into DataFrame construction,
  * driver-side planning (analysis + optimization + physical planning,
  * forced via `executedPlan`) and execution into the noop sink, and
  * count jobs / stages / tasks plus executor-side task time, GC and
  * shuffle bytes from a listener. A query whose exec wall far exceeds
  * its summed task time is scheduler/driver-bound (many tiny jobs), not
  * compute-bound — the distinction that decides which guide section
  * applies. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile q265 q124"
  *
  * Prefix-matches query names (like the bench's ONLY knob). Each query
  * runs SPARK_GRAFT_PROFILE_RUNS times (default 2); the LAST (warm) run
  * is reported.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val prefixes = if (args.nonEmpty) args.toSeq else Seq("q")
    val spark = GraftSession(appName = "graft-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/nation.parquet").count()

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    println(f"${"query"}%-28s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"jobs"}%5s ${"stage"}%5s ${"tasks"}%6s ${"taskS"}%7s ${"gcS"}%6s ${"shufMB"}%7s")
    for ((name, fn) <- names) {
      var line = ""
      for (_ <- 1 to runs) {
        // settle the async listener bus before zeroing the counters
        Thread.sleep(300)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); gcMs.set(0); shufR.set(0); shufW.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force driver-side planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        Thread.sleep(300) // let straggler listener events land
        def s(a: Long, b: Long) = (b - a) / 1e9
        line = f"$name%-28s ${s(t0, t1)}%7.3f ${s(t1, t2)}%7.3f ${s(t2, t3)}%7.3f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${taskMs.get / 1e3}%7.2f ${gcMs.get / 1e3}%6.2f ${(shufR.get + shufW.get) / 1e6}%7.1f"
      }
      println(line)
    }
    spark.stop()
  }
}
