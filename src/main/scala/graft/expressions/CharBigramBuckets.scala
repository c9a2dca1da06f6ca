package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed character-bigram feature buckets of a string — the DSIR feature
  * extractor ([[graft.operators.Importance]]) as ONE linear pass over the
  * text's code points inside whole-stage codegen:
  * `out(i) = (cp(cᵢ)·131 + cp(cᵢ₊₁)) mod buckets`.
  *
  * Exists because the declarative formulation
  * (`transform(sequence(1, len−1), i -> ascii(substring(text, i, 1))…)`)
  * re-seeks the string per index — UTF-8 `substring` is O(i), so a
  * document costs O(len²) plus two UTF8String allocations per position.
  * This pass is O(len) with zero per-char allocation, and its code-point
  * semantics match `ascii`/`ord` exactly (surrogate pairs included), so
  * the DuckDB oracle formulation is unchanged.
  */
case class CharBigramBuckets(child: Expression, buckets: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"char_bigram_buckets needs a string child, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharBigramBuckets.compute(input.asInstanceOf[UTF8String], buckets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.CharBigramBuckets.compute($c, $buckets));")

  override protected def withNewChildInternal(newChild: Expression): CharBigramBuckets =
    copy(child = newChild)

  override def prettyName: String = "char_bigram_buckets"
}

object CharBigramBuckets {

  /** One code-point pass; `(prev·131 + cp) mod buckets` per adjacent pair.
    * Sub-bigram strings return an empty array (explode drops the row —
    * the same contract as the declarative form's empty `sequence`).
    */
  def compute(text: UTF8String, buckets: Int): Array[Int] = {
    val s = text.toString
    val n = s.length
    if (n < 2) return Array.emptyIntArray
    val out = new Array[Int](s.codePointCount(0, n) - 1)
    var i = 0
    var k = 0
    var prev = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      if (prev >= 0) { out(k) = (prev * 131 + cp) % buckets; k += 1 }
      prev = cp
      i += Character.charCount(cp)
    }
    out
  }
}
