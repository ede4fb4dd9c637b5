package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Zero-row inputs must flow through every operator family without
  * crashing (national runs hit empty counties / empty measure tables —
  * the reference special-cases one such branch, fa-etl.py:366-391; our
  * operators must all be total on empty inputs). */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))))

  private val emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family is total on empty input") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", col("text")).count() == 0)
    assert(Dedup.minHashCandidates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text",
      maxShingleFreq = Some(10)).count() == 0)
  }

  test("similarity family is total on empty input") {
    assert(Similarity.bruteForceTopK(emptyEmb, "vec_id", "embedding").count() == 0)
    assert(Similarity.lshTopK(emptyEmb, "vec_id", "embedding").count() == 0)
    assert(Similarity.ivfTopK(emptyEmb, "vec_id", "embedding").count() == 0)
    assert(Dedup.embeddingNearDups(emptyEmb, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("windows and text analysis are total on empty input") {
    assert(Windows.topOnePerGroup(emptyDocs, Seq(col("doc_id")),
      Seq(col("text").desc)).count() == 0)
    assert(Windows.topOneByAgg(emptyDocs, Seq(col("doc_id")),
      struct(col("text"))).count() == 0)
    assert(TextAnalysis.qualityMetrics(emptyDocs, "doc_id", "text").count() == 0)
  }
}
