package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's character distribution in one
  * pass — a cheap quality signal: gibberish and key-mash text score near
  * the uniform ceiling, template/boilerplate text scores low, natural
  * prose sits in a stable band. Used by `TextAnalysis`-style curation
  * filters as a per-row scalar.
  *
  * Why custom (same escalation as [[RepetitionStats]]): the declarative
  * formulation explodes one row per CHARACTER (n_chars× row inflation
  * through a shuffle) just to count frequencies that fit in a 128-slot
  * array — this expression is one eval per row with zero row inflation,
  * and it composes into any scan-stage filter. The checked q82 pins it
  * against exactly that exploded formulation replayed by the oracle.
  *
  * Semantics: distribution over Unicode CODE POINTS (so a multibyte
  * character is one symbol, matching an engine that splits strings into
  * characters rather than bytes). ASCII counts ride a flat 128-slot
  * array; anything else falls to a hash map. Terms accumulate in sorted
  * code-point order, so the float sum is deterministic for identical
  * input regardless of hash-map iteration quirks (cross-ENGINE sum-order
  * noise is absorbed by the caller's rounding, the cosine/PSI
  * precedent). Empty string → 0.0; null → null. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ascii = new Array[Long](128)
    var other: java.util.TreeMap[Integer, java.lang.Long] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.TreeMap[Integer, java.lang.Long]()
        other.put(cp, other.getOrDefault(cp, 0L) + 1L)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0d
    var ent = 0.0d
    def add(c: Long): Unit = if (c > 0L) {
      val p = c.toDouble / n
      ent -= p * math.log(p)
    }
    var cp = 0
    while (cp < 128) { add(ascii(cp)); cp += 1 }
    if (other != null) other.forEach((_, c) => add(c))
    ent
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** Shannon entropy (nats) of a string column's code-point distribution. */
  def char_entropy(text: Column): Column =
    GraftShims.toColumn(CharEntropy(GraftShims.toExpression(text)))
}
