package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the raw material
  * of the compression-ratio quality filter LLM pretraining pipelines run
  * (Gopher/RefinedWeb lineage: text that compresses far better than
  * prose is boilerplate, tag soup, or repetition spam; text that barely
  * compresses is often encoded noise). Runs inside whole-stage codegen
  * as a scalar, so the ratio predicate sits in the scan projection like
  * any other pushed filter input.
  *
  * Deterministic BY PINNING, not by hope: compression happens at a FIXED
  * level (6, the zlib default) with the default strategy, raw-deflate
  * framing (`nowrap = true`, no zlib header/checksum), and a fresh
  * per-call Deflater — the same bytes always produce the same size on a
  * given JRE's zlib. The absolute size is an implementation detail of
  * that zlib build; the engine therefore exposes the size for RATIO use
  * (spec pins ordering/monotonicity invariants, not absolute bytes) and
  * the driver query is declared rows-only — there is nothing for a SQL
  * oracle to recompute.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"deflate_size needs a string child, got ${child.dataType}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DeflateSize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)

  override def prettyName: String = "deflate_size"
}

object DeflateSize {

  /** Raw-deflate the UTF-8 bytes at level 6 and return the compressed
    * byte count. A fresh Deflater per call keeps the result independent
    * of any cross-row state; the 8 KiB drain buffer only shapes loop
    * iterations, never the count.
    */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
