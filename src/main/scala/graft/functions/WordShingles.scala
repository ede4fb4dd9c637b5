package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array — native form of
  * `Dedup.shingles` (identical output: space-joined n-grams; a doc shorter
  * than n yields the whole doc as one shingle).
  *
  * The HOF form (transform + slice + array_join) is CodegenFallback and
  * allocates a slice array per shingle — measured ~10 µs per shingle at
  * sf0.1, and Catalyst re-evaluates it once per consumer (the Jaccard
  * self-join reads it three times). This loop reuses one parts buffer. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (len < n) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      val parts = new Array[UTF8String](n)
      var s = 0
      while (s <= len - n) {
        var j = 0
        while (j < n) { parts(j) = toks(s + j); j += 1 }
        out(s) = UTF8String.concatWs(space, parts: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def word_shingles(tokens: Column, n: Int): Column =
    GraftShims.toColumn(WordShingles(GraftShims.toExpression(tokens), n))
}
