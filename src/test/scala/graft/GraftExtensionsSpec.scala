package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL access to the native expressions via the extensions hook. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate the native expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(split('a b c', ' ')) AS sh,
                simhash64(split('a b c', ' ')) AS sh2,
                cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS cs,
                minhash_sig(split('a b c d e', ' '), 4, 3) AS mh""").collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getSeq[Long](3).length == 4)
  }

  test("withExtensions wires functions at session build") {
    // a second session in the same JVM shares the context but gets its own
    // state; extensions must apply
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the existing session; register covers both
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT cosine_sim(array(1.0d,0.0d), array(0.0d,1.0d)) c")
      .collect()(0).getDouble(0) == 0.0)
  }
}
