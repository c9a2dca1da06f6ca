package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a BROADCAST Bloom filter —
  * the row-level pre-filter that turns a big-big semi join into a scan-side
  * cut. `mightContain` never returns a false negative, so dropping
  * non-members before an exact equi-join leaves the join's result EXACT;
  * false positives (rate `fpp`) merely ride along until the join drops
  * them.
  *
  * The filter travels as broadcast BYTES (one copy per executor via the
  * block manager — never serialized into the plan, which an `isin` literal
  * or a lit(bytes) would do) and is deserialized lazily ONCE per executor
  * instance of the expression. The probe itself is two hash functions over
  * the string's UTF-8 bytes inside whole-stage codegen — no shuffle, no
  * UDF boundary.
  *
  * This is the engine-owned sibling of Spark's own runtime-filter
  * injection: explicit, so a pipeline can build the filter from a frame
  * Spark's optimizer cannot see is small (e.g. a shingled eval set), and
  * reuse it across many queries.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[Array[Byte]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string child, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  // Deserialized once per JVM instance of this expression (tasks share the
  // generated-class reference object); the broadcast keeps the bytes off
  // the serialized plan.
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloom.value))

  /** Shared by interpreted eval and the codegen'd call. */
  def test(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Serialize a built filter to broadcastable bytes. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
