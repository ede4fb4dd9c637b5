package graft.ops

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Sources.warcRecords]] against a hand-built WET fixture: header
  * fields, payload boundaries (including a payload with blank lines and
  * header-looking text), the warcinfo record, and the pre-sentinel
  * prologue must all parse exactly. */
class WarcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def crlf(lines: String*): String = lines.mkString("\r\n")

  private def fixture(): String = {
    val dir = Files.createTempDirectory("warc_fix")
    val body1 = "The quick brown fox.\r\nIt jumped over the dog."
    val body2 = crlf("First paragraph.", "",
      "Second paragraph after a blank line.",
      "WARC-Type: this is payload text, not a header")
    val content = crlf(
      "WARC/1.0",
      "WARC-Type: warcinfo",
      "WARC-Date: 2026-08-14T00:00:00Z",
      "Content-Length: 4",
      "",
      "info",
      "",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: http://example.com/a",
      "WARC-Date: 2026-08-14T01:02:03Z",
      s"Content-Length: ${body1.getBytes("UTF-8").length}",
      "",
      body1,
      "",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: http://example.org/b",
      "WARC-Date: 2026-08-14T04:05:06Z",
      s"Content-Length: ${body2.getBytes("UTF-8").length}",
      "",
      body2,
      "", "")
    val p = dir.resolve("part-00000.warc.wet")
    Files.write(p, content.getBytes("UTF-8"))
    dir.toString
  }

  test("WET records parse to (type, url, date, length, payload) with " +
    "exact payload boundaries") {
    val rows = Sources.warcRecords(spark, fixture())
      .as[(String, String, String, Long, String)].collect()
      .sortBy(_._2)
    assert(rows.length == 3)
    val info = rows.head
    assert(info._1 == "warcinfo" && info._2 == "" && info._5 == "info")
    val a = rows(1)
    assert(a._1 == "conversion" && a._2 == "http://example.com/a")
    assert(a._3 == "2026-08-14T01:02:03Z")
    assert(a._5 == "The quick brown fox.\r\nIt jumped over the dog.")
    assert(a._4 == a._5.getBytes("UTF-8").length)
    val b = rows(2)
    assert(b._2 == "http://example.org/b")
    assert(b._5.contains("Second paragraph after a blank line."))
    assert(b._5.endsWith("not a header"),
      s"payload must keep header-looking body text: '${b._5}'")
    assert(b._5.split("\r\n\r\n").length == 2, "inner blank line preserved")
  }

  test("the parsed corpus feeds the curation surface directly") {
    val docs = Sources.warcRecords(spark, fixture())
      .where($"warc_type" === "conversion")
      .select($"url", $"payload".as("text"))
    assert(docs.count() == 2)
    val toks = TextAnalysis.tokenCounts(docs.withColumn("doc_id",
        xxhash64($"url")), "doc_id", "text")
    assert(toks.count() == 2)
  }

  private def xxhash64(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.xxhash64(c)
}
