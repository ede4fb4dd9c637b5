package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Windows

/** Wide-row evidence for the `topOneByAgg` vs `topOnePerGroup` claim
  * (Windows.scala): the agg form drops two per-partition sorts + the rank
  * pass, which should matter exactly when rows are WIDE (sorting moves
  * whole rows; `InferWindowGroupLimit` already equalizes the shuffle
  * volume). This harness measures it instead of arguing it.
  *
  * Shape: `rows` rows in `rows/10`-sized groups, a tie-free order column,
  * and `nPayload` extra columns (half 32-char strings, half doubles) —
  * the 50+-column regime of a real property panel. Both forms run to a
  * noop sink (every projected column materialized, nothing pruned), 3
  * runs each, min reported, narrow (2 payload cols) vs wide contrasted
  * in one JVM.
  *
  *   sbt "runMain graft.tools.WideRowRace 4000000 52"
  */
object WideRowRace {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nPayload = args.lift(1).map(_.toInt).getOrElse(52)
    val spark = GraftSession(appName = "wide-row-race")
    spark.sparkContext.setLogLevel("WARN")

    def mkTable(payloadCols: Int, path: String): Unit = {
      val base = spark.range(0, rows, 1, 32)
        .select(col("id"),
          (col("id") % (rows / 10)).as("k"),
          pmod(hash(col("id")), lit(1000000007)).as("ord"))
      val wide = (0 until payloadCols).foldLeft(base) { (df, i) =>
        if (i % 2 == 0)
          df.withColumn(s"s$i", md5(concat(col("id").cast("string"), lit(i))))
        else
          df.withColumn(s"d$i", (col("id") * (i + 1) % 997).cast("double"))
      }
      wide.write.mode("overwrite").parquet(path)
    }

    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$name t=$t%.2fs")
      t
    }

    for ((label, cols) <- Seq(("narrow", 2), ("wide", nPayload))) {
      val path = s"/tmp/widerow_$label"
      mkTable(cols, path)
      val df = spark.read.parquet(path)
      println(s"$label: ${df.columns.length} columns, $rows rows")
      def run(name: String, result: => org.apache.spark.sql.DataFrame): Double =
        (1 to 3).map(_ => timed(s"${label}_$name") {
          result.write.mode("overwrite").format("noop").save()
        }).min
      val w = run("WINDOW", Windows.topOnePerGroup(df, Seq(col("k")),
        Seq(col("ord").desc, col("id").asc)))
      val a = run("AGG", Windows.topOneByAgg(df, Seq(col("k")),
        struct(col("ord"), -col("id"))))
      println(f"${label.toUpperCase}_MIN window=$w%.2fs agg=$a%.2fs " +
        f"ratio=${w / a}%.2f")
    }
    spark.stop()
  }
}
