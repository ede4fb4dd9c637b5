package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Prints the SimHash hamming distance of every exact 2-gram-Jaccard≥0.8
  * near-dup pair — calibration probe for q29's maxHamming (the exact check
  * must be a SUBSET of the simhash candidates for the oracle to match). */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.8)
    // signature features: 1 = unigram tokens, n>1 = word n-gram shingles
    // (q29 runs featureShingle=2 — see Dedup.simHashNearDups scaladoc)
    val featureShingle = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val truePairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text",
        shingleSize = 2, threshold = threshold)
      val toks = split(col("text"), " ")
      val feats = if (featureShingle <= 1) toks
        else graft.ops.Dedup.shingles(toks, featureShingle)
      val sigs = docs.select(col("doc_id"), simhash64(feats).as("sh"))
      val withHam = truePairs
        .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      val hist = withHam.groupBy(col("hamming")).count()
        .orderBy(col("hamming")).collect()
      println(s"SF$sf hamming histogram of true pairs: " +
        hist.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    }
    spark.stop()
  }
}
