package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Similarity, Windows}

/** Measurement harness for the [[graft.functions.HyperplaneSig]]
  * escalation (round-4 verdict item #2): races the native expression
  * against the zip_with/aggregate HOF baseline — signature stage alone
  * and the full q30 (lshTopK) pipeline — on the sf0.1 embeddings
  * replicated `mult`× (ids offset so signatures differ across copies).
  * Timings reduce over the real output (sum of signatures / score
  * digest), never count() (Catalyst would gut the plan — see RaceBench).
  *
  *   sbt "runMain graft.tools.SigRace 20"
  */
object SigRace {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = GraftSession(appName = "sig-race")

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = base
      .crossJoin(spark.range(0, mult).withColumnRenamed("id", "__copy"))
      .select((col("vec_id") * mult + col("__copy")).as("vec_id"),
        // perturb one component per copy so replicated vectors hash apart
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("__copy"), lit(64)).cast("int"),
            x + col("__copy").cast("float") / 100f).otherwise(x)).as("embedding"))
      .repartition(32).cache()
    println(s"VECTORS=${emb.count()}")

    def timed(name: String)(body: => String): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"$name out=$out t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def sigDigest(sig: Column): String =
      emb.agg(sum(sig.cast("double"))).collect()(0).toString

    // q30's pipeline with a pluggable signature expression (mirrors
    // Similarity.lshTopK line for line). Runs on a ~100k-vector slice:
    // bucket population grows ~N/256, so the within-bucket pair join is
    // quadratic in N — 1M vectors would measure the pair join, not the
    // signature delta under test.
    val embQ30 = emb.filter(pmod(col("vec_id"), lit(math.max(mult / 20, 1))) === 0)
    def topK(sig: Column, k: Int = 5): DataFrame = {
      val sigs = embQ30.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"), sig.as("sig"))
      val chunked = Similarity.chunkedBuckets(sigs, col("sig"), 2)
        .select(col("id"), col("v"), col("chunk"), col("key"))
      val pairs = chunked.select(col("chunk"), col("key"),
          col("id").as("query_id"), col("v").as("qv"))
        .join(chunked.select(col("chunk"), col("key"),
          col("id").as("cand_id"), col("v").as("v")), Seq("chunk", "key"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          round(Similarity.cosine(col("qv"), col("v")), 4).as("cos"))
        .distinct()
      Windows.topKPerGroup(pairs, Seq(col("query_id")),
        Seq(col("cos").desc, col("cand_id").asc), k)
    }
    def pipeDigest(df: DataFrame): String =
      df.agg(count(lit(1)), round(sum(col("cos")), 2)).collect()(0).toString

    val native = Similarity.lshSignature(col("embedding"))
    val hof = Similarity.lshSignatureHof(col("embedding"))
    for (round <- 1 to 2) { // round 1 warms, round 2 is the number
      timed(s"SIG_NATIVE_$round") { sigDigest(native) }
      timed(s"SIG_HOF_$round") { sigDigest(hof) }
      timed(s"Q30_NATIVE_$round") { pipeDigest(topK(native)) }
      timed(s"Q30_HOF_$round") { pipeDigest(topK(hof)) }
    }
    spark.stop()
  }
}
