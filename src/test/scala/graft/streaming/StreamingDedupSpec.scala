package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Dedup

/** Streaming corpus admission: greedy cross-batch semantics, replay
  * idempotence, and single-batch equivalence with the batch operator. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tA = "x y z w v u t s q r"
  private val tC = "m n o p q r s t u v w"

  private def dirs() = {
    val root = Files.createTempDirectory("sdedup").toString
    (s"$root/corpus", s"$root/sigs", s"$root/decisions", s"$root/ckpt")
  }

  test("admitBatch: greedy cross-batch admission, then idempotent replay") {
    val (corpus, sigs, decisions, _) = dirs()
    val b0 = Seq((1L, tA), (2L, tA), (3L, tC)).toDF("doc_id", "text")
    StreamingDedup.admitBatch(b0, 0L, "doc_id", "text", corpus, sigs, decisions)
    val b1 = Seq((4L, tA), // dup of admitted doc 1 -> dup_corpus
      (5L, "entirely fresh unique content nothing matches this at all"))
      .toDF("doc_id", "text")
    StreamingDedup.admitBatch(b1, 1L, "doc_id", "text", corpus, sigs, decisions)
    val got = spark.read.parquet(decisions)
      .select("doc_id", "status").as[(Long, String)].collect().sorted
    assert(got.sameElements(Array(1L -> "accepted", 2L -> "dup_batch",
      3L -> "accepted", 4L -> "dup_corpus", 5L -> "accepted")))
    // replay batch 1 (restart-between-write-and-commit): overwrite of its
    // own batch_id partition, no duplicated rows anywhere
    StreamingDedup.admitBatch(b1, 1L, "doc_id", "text", corpus, sigs, decisions)
    assert(spark.read.parquet(decisions).count() == 5)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.sameElements(Array(1L, 3L, 5L)))
    assert(spark.read.parquet(sigs).select("doc_id").as[Long]
      .collect().sorted.sameElements(Array(1L, 3L, 5L)))
  }

  test("streaming admit over a file source == batch operator (empty corpus)") {
    val (corpus, sigs, decisions, ckpt) = dirs()
    val src = Files.createTempDirectory("sdedup_src").toString
    val docs = Seq((1L, tA), (2L, tA), (3L, tC),
      (4L, "another clearly distinct document with different words")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    val q = StreamingDedup.admit(stream, "doc_id", "text",
      corpus, sigs, decisions, ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(decisions)
      .select("doc_id", "status").as[(Long, String)].collect().sorted
    val batch = Dedup.incrementalNearDups(docs.limit(0), docs, "doc_id", "text")
      .as[(Long, String)].collect().sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("native dropDuplicatesWithinWatermark == batch dropDuplicates on " +
    "an at-least-once replay whose duplicate re-delivery gap is inside " +
    "the delay (the built-in EXACT-dedup tier beside near-dup admit)") {
    import graft.ops.Events
    val ev = Events.load(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"))
    // at-least-once source: every event delivered twice, same payload —
    // the exact-key dedup dropDuplicatesWithinWatermark exists for.
    // Within-watermark state eviction is the 100 TB/day contract plain
    // dropDuplicates (unbounded key state) cannot honor.
    val src = Files.createTempDirectory("sdedup_wm").toString
    ev.union(ev).coalesce(1).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(src)
    val expected = ev.select("event_id").distinct()
      .as[Long].collect().toSet
    val q = spark.readStream.schema(ev.schema).parquet(src)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ddw_out").select("event_id")
        .as[Long].collect()
      assert(got.length == got.toSet.size, "a key emitted twice")
      assert(got.toSet == expected,
        s"missing=${(expected -- got.toSet).take(5)}")
    } finally q.stop()
  }
}
