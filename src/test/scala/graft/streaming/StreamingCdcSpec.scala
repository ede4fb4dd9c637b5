package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Snapshot

/** The streaming latest-change table must equal the batch window top-1
  * over the full CDC batch — and merging it into the base must reproduce
  * `Snapshot.applyCdc` of the full batch — after an out-of-order,
  * multi-micro-batch replay (random repartition puts seq-2 waves before
  * seq-1 waves for many keys, exercising both the improve and the
  * stale-loses paths of the processor). */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed latest-change table == batch top-1; merge == applyCdc") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    def cents = round(col("o_totalprice") * 100).cast(LongType)
    val base = orders.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey").as("k"), cents.as("price_cents"),
        col("o_orderstatus").as("status"))
    val w1 = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), (cents + 100).as("price_cents"),
        col("o_orderstatus").as("status"), lit(1L).as("seq"),
        lit("U").as("op"))
    val w2 = orders.filter(col("o_orderkey") % 14 === 0)
      .select(col("o_orderkey").as("k"), (cents + 200).as("price_cents"),
        col("o_orderstatus").as("status"), lit(2L).as("seq"),
        when(col("o_orderkey") % 21 === 0, "D").otherwise("U").as("op"))
    val changes = w1.unionByName(w2)

    val dir = Files.createTempDirectory("cdc_stream").toString
    // random spread over several files: seqs arrive out of order
    changes.repartition(6).write.mode("overwrite").parquet(dir)

    val expectLatest = changes
      .groupBy(col("k"))
      .agg(max_by(struct(changes.columns.map(col): _*), col("seq")).as("w"))
      .select(col("w.*"))
      .as[StreamingCdc.Change].collect().toSet
    val expectMerged = Snapshot.applyCdc(base, changes, Seq("k"), "seq", "op")
      .as[(Long, Long, String, String)].collect().toSet

    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[StreamingCdc.Change]
      val q = StreamingCdc.latestChanges(stream).toDF()
        .writeStream.format("memory").queryName("cdc_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val sunk = spark.table("cdc_out")
        // per key, emissions are monotone in seq: max_by is the current row
        val latest = sunk.groupBy(col("k"))
          .agg(max_by(struct(sunk.columns.map(col): _*), col("seq")).as("w"))
          .select(col("w.*"))
        assert(latest.as[StreamingCdc.Change].collect().toSet == expectLatest)
        // and merging the streamed table reproduces the batch merge
        val merged = Snapshot.applyCdc(base, latest, Seq("k"), "seq", "op")
          .as[(Long, Long, String, String)].collect().toSet
        assert(merged == expectMerged)
        // the stale-loses path actually ran: fewer emissions than changes
        // would prove it, but out-of-order arrival is file-layout luck —
        // assert the sink never emitted a key twice at the same seq
        val dupEmits = sunk.groupBy(col("k"), col("seq")).count()
          .filter(col("count") > 1).count()
        assert(dupEmits == 0L)
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
