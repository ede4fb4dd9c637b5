package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over word-shingles — custom Catalyst `Expression`.
  *
  * Computes, per row, the full k-wide MinHash signature of the
  * `shingleSize`-word shingles of a token array: for each shingle,
  * h = pmod(xxhash64(shingle_string, seed=42), P); for each of k seeded
  * affine hashes, sig_i = min over shingles of pmod(a_i*h + b_i, P).
  *
  * Why custom (SURVEY.md §7 preference order): the HOF formulation
  * (transform+slice+array_join to build shingles, then k array_min passes)
  * is CodegenFallback-interpreted and allocates a sliced array + joined
  * string per shingle — measured ~5 µs/shingle at sf0.1. This expression
  * does the same math in one tight loop, reusing a byte buffer per row,
  * and needs NO explode and NO shuffle: signatures are a per-row map-side
  * computation, which is the shape that survives 100 TB (the previous
  * explode+groupBy formulation shuffled one row per (doc, shingle)).
  *
  * Reference semantics (spec-verified in OpsSpec "MinHashSig expression
  * matches the composed HOF/explode formulation"): shingle string =
  * tokens joined by a single space (whole doc as one shingle when shorter
  * than `shingleSize`); base hash = pmod(xxhash64(shingle, seed 42), P);
  * seed stream = scala.util.Random(42) drawing (a = next(2^20)*2+1,
  * b = next(2^20)) per hash; P = `MinHashSig.P`.
  */
case class MinHashSig(child: Expression, k: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val P = MinHashSig.P
  // (a_i, b_i) pairs, bounded < 2^20 so a*h+b stays < 2^53: exact long math
  private lazy val ab: Array[Long] = {
    val rng = new scala.util.Random(42)
    Array.fill(2 * k)(0L).zipWithIndex.map { case (_, i) =>
      if (i % 2 == 0) rng.nextInt(1 << 20).toLong * 2 + 1
      else rng.nextInt(1 << 20).toLong
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    val space = UTF8String.fromString(" ")

    def update(shingle: UTF8String): Unit = {
      val h0 = XxHash64Function.hash(shingle, StringType, 42L)
      val h = ((h0 % P) + P) % P
      var i = 0
      while (i < k) {
        val v = (ab(2 * i) * h + ab(2 * i + 1)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }

    if (n < shingleSize) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = arr.getUTF8String(i); i += 1 }
      update(UTF8String.concatWs(space, parts: _*))
    } else {
      val toks = new Array[UTF8String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
      val parts = new Array[UTF8String](shingleSize)
      var s = 0
      while (s <= n - shingleSize) {
        var j = 0
        while (j < shingleSize) { parts(j) = toks(s + j); j += 1 }
        update(UTF8String.concatWs(space, parts: _*))
        s += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = 4294967311L // prime > 2^32, shared with graft.ops.Dedup

  /** minhash signature (array<long> of length k) of an array<string>
    * token column. */
  def minhash_sig(tokens: Column, k: Int, shingleSize: Int): Column =
    GraftShims.toColumn(MinHashSig(GraftShims.toExpression(tokens), k, shingleSize))
}
