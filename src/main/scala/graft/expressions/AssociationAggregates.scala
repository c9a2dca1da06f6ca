package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Categorical-association SQL aggregates — ClickHouse `cramersV(a, b)`,
  * `cramersVBiasCorrected(a, b)`, `theilsU(a, b)` — over a buffered
  * contingency map. State is one count per DISTINCT (a, b) cell (the cost
  * class of ClickHouse's own implementations — association between
  * categorical columns presumes bounded category sets; the cell-grain
  * `StatTests.contingencyChi2` is the frame-level decomposition for
  * drill-down). Eval walks the cells in SORTED order, so the float
  * accumulation order is deterministic under any partitioning/merge
  * order — the property a frame-level summed statistic cannot have.
  */
object AssociationAggregates {

  type CellMap = mutable.HashMap[(String, String), Long]

  private[expressions] def evalKey(e: Expression, input: InternalRow): String =
    e.eval(input) match {
      case null => null
      case u: UTF8String => u.toString
      case other => other.toString
    }

  private[expressions] def serializeCells(m: CellMap): Array[Byte] = {
    var size = 4
    val items = m.toArray
    val enc = items.map { case ((a, b), c) =>
      (a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8), c)
    }
    enc.foreach { case (ab, bb, _) => size += 4 + ab.length + 4 + bb.length + 8 }
    val buf = ByteBuffer.allocate(size)
    buf.putInt(enc.length)
    enc.foreach { case (ab, bb, c) =>
      buf.putInt(ab.length); buf.put(ab)
      buf.putInt(bb.length); buf.put(bb)
      buf.putLong(c)
    }
    buf.array()
  }

  private[expressions] def deserializeCells(bytes: Array[Byte]): CellMap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val m = new CellMap
    var i = 0
    while (i < n) {
      val a = new Array[Byte](buf.getInt); buf.get(a)
      val b = new Array[Byte](buf.getInt); buf.get(b)
      m.put((new String(a, StandardCharsets.UTF_8),
        new String(b, StandardCharsets.UTF_8)), buf.getLong)
      i += 1
    }
    m
  }

  /** χ² over the sorted cells plus the margin cardinalities. */
  private def chi2(m: CellMap): (Double, Long, Int, Int) = {
    val rows = new mutable.HashMap[String, Long]
    val cols = new mutable.HashMap[String, Long]
    var n = 0L
    m.foreach { case ((a, b), c) =>
      rows.update(a, rows.getOrElse(a, 0L) + c)
      cols.update(b, cols.getOrElse(b, 0L) + c)
      n += c
    }
    var x2 = 0.0
    m.toArray.sortBy(_._1).foreach { case ((a, b), c) =>
      val e = rows(a).toDouble * cols(b) / n
      val d = c - e
      x2 += d * d / e
    }
    (x2, n, rows.size, cols.size)
  }

  /** Cramér's V: `√(χ²/n / (min(r,c)−1))`; NaN-free null when degenerate
    * (single category on either side).
    */
  def cramersV(m: CellMap): Any = {
    if (m.isEmpty) return null
    val (x2, n, r, c) = chi2(m)
    val k = math.min(r, c) - 1
    if (k <= 0) return null
    math.sqrt(x2 / n / k)
  }

  /** Bias-corrected Cramér's V (Bergsma 2013): φ̃² = max(0, χ²/n −
    * (r−1)(c−1)/(n−1)), r̃ = r − (r−1)²/(n−1), c̃ likewise,
    * Ṽ = √(φ̃²/min(r̃−1, c̃−1)).
    */
  def cramersVBiasCorrected(m: CellMap): Any = {
    if (m.isEmpty) return null
    val (x2, n, r, c) = chi2(m)
    if (math.min(r, c) <= 1 || n <= 1) return null
    val nd = n.toDouble
    val phi2 = math.max(0.0, x2 / nd - (r - 1.0) * (c - 1.0) / (nd - 1.0))
    val rT = r - (r - 1.0) * (r - 1.0) / (nd - 1.0)
    val cT = c - (c - 1.0) * (c - 1.0) / (nd - 1.0)
    val k = math.min(rT - 1.0, cT - 1.0)
    if (k <= 0) return null
    math.sqrt(phi2 / k)
  }

  /** Theil's U — the uncertainty coefficient U(a|b): how much knowing `b`
    * reduces the entropy of `a`; asymmetric, in [0, 1]. `(H(a) −
    * H(a|b))/H(a)`; null when H(a) = 0 (a is constant).
    */
  def theilsU(m: CellMap): Any = {
    if (m.isEmpty) return null
    val rows = new mutable.HashMap[String, Long]
    val cols = new mutable.HashMap[String, Long]
    var n = 0L
    m.foreach { case ((a, b), c) =>
      rows.update(a, rows.getOrElse(a, 0L) + c)
      cols.update(b, cols.getOrElse(b, 0L) + c)
      n += c
    }
    val nd = n.toDouble
    var ha = 0.0
    rows.toArray.sortBy(_._1).foreach { case (_, c) =>
      val p = c / nd
      ha -= p * math.log(p)
    }
    if (ha == 0.0) return null
    // H(a|b) = Σ_b p(b) H(a|B=b) — walk cells sorted, grouped by b
    var hab = 0.0
    m.toArray.sortBy { case ((a, b), _) => (b, a) }.foreach { case ((_, b), c) =>
      val pab = c / nd
      val pb = cols(b) / nd
      hab -= pab * math.log(pab / pb)
    }
    (ha - hab) / ha
  }
}

/** Base of the contingency-map SQL aggregates. Null categories are
  * ignored (no cell). */
abstract class ContingencyAgg
  extends TypedImperativeAggregate[AssociationAggregates.CellMap] {
  def a: Expression
  def b: Expression

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): AssociationAggregates.CellMap =
    new AssociationAggregates.CellMap

  override def update(m: AssociationAggregates.CellMap,
                      input: InternalRow): AssociationAggregates.CellMap = {
    val ka = AssociationAggregates.evalKey(a, input)
    val kb = AssociationAggregates.evalKey(b, input)
    if (ka != null && kb != null)
      m.update((ka, kb), m.getOrElse((ka, kb), 0L) + 1L)
    m
  }

  override def merge(m: AssociationAggregates.CellMap,
                     other: AssociationAggregates.CellMap): AssociationAggregates.CellMap = {
    other.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
    m
  }

  override def serialize(m: AssociationAggregates.CellMap): Array[Byte] =
    AssociationAggregates.serializeCells(m)

  override def deserialize(bytes: Array[Byte]): AssociationAggregates.CellMap =
    AssociationAggregates.deserializeCells(bytes)
}

/** `cramers_v(a, b)` → double in [0, 1] (ClickHouse `cramersV`). */
case class CramersVAgg(a: Expression, b: Expression, corrected: Boolean,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0) extends ContingencyAgg {
  override def eval(m: AssociationAggregates.CellMap): Any =
    if (corrected) AssociationAggregates.cramersVBiasCorrected(m)
    else AssociationAggregates.cramersV(m)
  override def prettyName: String =
    if (corrected) "cramers_v_bias_corrected" else "cramers_v"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
}

/** `theils_u(a, b)` → double in [0, 1], asymmetric U(a|b) (ClickHouse
  * `theilsU`). */
case class TheilsUAgg(a: Expression, b: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0) extends ContingencyAgg {
  override def eval(m: AssociationAggregates.CellMap): Any =
    AssociationAggregates.theilsU(m)
  override def prettyName: String = "theils_u"
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
}
