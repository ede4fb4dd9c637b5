package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, HyperplaneSig, MinHashSig, SimHash64}

/** `SparkSessionExtensions` hook exposing graft's native expressions to
  * SQL users:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   -- or --
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * then `SELECT simhash64(split(text, ' ')), cosine_sim(a, b),
  * minhash_sig(toks, 16, 3) FROM ...` work in plain SQL.
  *
  * Also injects the [[graft.plans.RewriteTopOneToMaxBy]] optimizer rule
  * (row_number()=1 dedup → max_by aggregate — sort-free plan shape, time-
  * neutral at local scale; kill-switch `spark.graft.rewriteTopOne=false`).
  * Parity with the
  * reference needs no planner `Strategy` (SURVEY.md §4) — the rule is a
  * pure plan-quality optimization, not new semantics. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteTopOneToMaxBy)
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<double>, array<double>) - cosine similarity"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>, k, n) - MinHash signature over word n-shingles"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        GraftExtensions.literalInt(args(1), "minhash_sig", "k"),
        GraftExtensions.literalInt(args(2), "minhash_sig", "shingleSize"))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(array, nBits, dim) - seeded random-hyperplane LSH signature; raises on dim mismatch"),
      GraftExtensions.hyperplaneSigBuilder))
    // Spark ships these two for AQE runtime filters but does NOT register
    // them in the SQL registry — expose them so SQL users get the explicit
    // bloom build/probe path (see Sketches.bloomAgg/mightContain)
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg", "bloom_filter_agg(xxhash64(key), estItems, numBits) - mergeable bloom filter binary"),
      GraftExtensions.bloomAggBuilder))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain", "might_contain(bloom, xxhash64(key)) - bloom membership probe; bloom must be constant or scalar subquery"),
      GraftExtensions.mightContainBuilder))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(array<string>, n) - word n-gram shingles (whole doc when shorter)"),
      (args: Seq[Expression]) => graft.functions.WordShingles(args(0),
        GraftExtensions.literalInt(args(1), "word_shingles", "n"))))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(array<string>) - struct(top_uni, top_bi, dup_tri) repetition counts"),
      (args: Seq[Expression]) => graft.functions.RepetitionStats(args.head)))
    ext.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(string) - Shannon entropy (nats) of the code-point distribution"),
      (args: Seq[Expression]) => graft.functions.CharEntropy(args.head)))
    ext.injectFunction((FunctionIdentifier("int8_scale"),
      info("int8_scale", "int8_scale(array<double>) - round(max|x|/127, 6) symmetric quantization scale"),
      (args: Seq[Expression]) => graft.functions.Int8Scale(args.head)))
    ext.injectFunction((FunctionIdentifier("int8_quant"),
      info("int8_quant", "int8_quant(array<double>, scale) - clamp(round(x/scale), +-127) int array"),
      (args: Seq[Expression]) => graft.functions.Int8Quant(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("int8_max_err"),
      info("int8_max_err", "int8_max_err(array<double>, scale) - round-6 max reconstruction error"),
      (args: Seq[Expression]) => graft.functions.Int8MaxErr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("int8_dot"),
      info("int8_dot", "int8_dot(array<int>, array<int>) - exact integer dot product"),
      (args: Seq[Expression]) => graft.functions.Int8Dot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(string, string) - byte-level Jaro-Winkler similarity (DuckDB parity)"),
      (args: Seq[Expression]) => graft.functions.JaroWinkler(args(0), args(1))))
  }
}

object GraftExtensions {

  /** SQL builder for hyperplane_sig — applies the same array<double> cast
    * and wrong-dim fail-fast as the Scala API
    * ([[graft.ops.Similarity.lshSignature]]), rebuilt here as raw Catalyst
    * nodes (a builder can't round-trip through the Column API: the
    * wrapping ColumnNodeExpression never resolves inside a SQL plan).
    * Without the guard, a wrong-dim vector silently yields an all-zero
    * signature, collapsing the corpus into one LSH bucket (the O(N²) skew
    * bomb the signature docs warn about). */
  private def hyperplaneSigBuilder: Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
      val nBits = literalInt(args(1), "hyperplane_sig", "nBits")
      val dim = literalInt(args(2), "hyperplane_sig", "dim")
      val v0 = Cast(args(0), ArrayType(DoubleType))
      val raise = new RaiseError(Concat(Seq(
        Literal(s"lshSignature: expected dim $dim, got vector of size "),
        Coalesce(Seq(Cast(Size(v0), StringType), Literal("null"))))))
      val guarded = CaseWhen(Seq(
        (IsNull(v0), v0),
        (EqualTo(Size(v0), Literal(dim)), v0)), Some(raise))
      HyperplaneSig(guarded,
        graft.ops.Similarity.hyperplanes(nBits, dim)
          .map(_.toIndexedSeq).toIndexedSeq)
    }

  private def bloomAggBuilder: Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.LongType
      // est/bits literals arrive as INT from SQL; the aggregate wants BIGINT
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        args(0), Cast(args(1), LongType), Cast(args(2), LongType))
    }

  private def mightContainBuilder: Seq[Expression] => Expression =
    (args: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args(0), args(1))

  private[graft] def literalInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable,
      s"$fn: $arg must be a literal integer, got non-foldable: $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Register the same functions + optimizer rule on an already-built
    * session (extensions normally apply at build time; this covers
    * driver-owned sessions). The rule lands in the "User Provided
    * Optimizers" batch, which runs after `InsertWindowGroupLimit` — the
    * rule's matcher handles the already-inserted group-limit node. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteTopOneToMaxBy)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteTopOneToMaxBy
    }
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => SimHash64(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      (args: Seq[Expression]) => CosineSim(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      (args: Seq[Expression]) => MinHashSig(args(0),
        GraftExtensions.literalInt(args(1), "minhash_sig", "k"),
        GraftExtensions.literalInt(args(2), "minhash_sig", "shingleSize")), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      GraftExtensions.hyperplaneSigBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      GraftExtensions.bloomAggBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("might_contain",
      GraftExtensions.mightContainBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      (args: Seq[Expression]) => graft.functions.WordShingles(args(0),
        GraftExtensions.literalInt(args(1), "word_shingles", "n")), "scala_udf")
    reg.createOrReplaceTempFunction("repetition_stats",
      (args: Seq[Expression]) => graft.functions.RepetitionStats(args.head),
      "scala_udf")
    reg.createOrReplaceTempFunction("char_entropy",
      (args: Seq[Expression]) => graft.functions.CharEntropy(args.head),
      "scala_udf")
    reg.createOrReplaceTempFunction("int8_scale",
      (args: Seq[Expression]) => graft.functions.Int8Scale(args.head),
      "scala_udf")
    reg.createOrReplaceTempFunction("int8_quant",
      (args: Seq[Expression]) => graft.functions.Int8Quant(args(0), args(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction("int8_max_err",
      (args: Seq[Expression]) => graft.functions.Int8MaxErr(args(0), args(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction("int8_dot",
      (args: Seq[Expression]) => graft.functions.Int8Dot(args(0), args(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      (args: Seq[Expression]) => graft.functions.JaroWinkler(args(0), args(1)),
      "scala_udf")
  }
}
