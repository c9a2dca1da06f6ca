package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join at the planner level — the extension mechanism
  * for operators Spark genuinely lacks: a logical node, a strategy, and a
  * sort-merge physical operator, injected via `experimental.extraStrategies`
  * (or a SparkSessionExtensions planner-strategy injection).
  *
  * Semantics match [[graft.operators.AsOfJoin.backward]] (ClickHouse ASOF
  * JOIN): each left row pairs with the newest right row of equal key and
  * timestamp ≤ the left timestamp. The physical operator asks the planner
  * for co-clustered children sorted on (keys, ts) — EnsureRequirements
  * inserts the exchanges/sorts — and then streams both sides through a
  * single forward merge per partition: O(|L|+|R|) row visits, one retained
  * right row per key, no window buffer, no struct packing.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        inner: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push left-side conjuncts of a Filter through
  * [[AsOfJoinPlan]]. Catalyst's own PushDownPredicates cannot see through an
  * unknown binary node, so without this a post-join filter on probe-side
  * columns runs after the merge instead of pruning the probe scan. Pushing
  * left-only is semantics-preserving for inner and outer (dropping a left
  * row never changes another row's match); right-side predicates stay put —
  * filtering the build side would change which row is "newest".
  */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, inner) =>
      AsOfJoinExec(lk, rk, lts, rts, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression, inner: Boolean,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both children must land in IDENTICAL hash partitionings — same
    * expressions, same fixed partition count — because `doExecute` pairs
    * partitions positionally with `zipPartitions`. Two plain
    * `ClusteredDistribution`s do NOT guarantee that (the SPARK-35703 trap):
    * e.g. a range-partitioned child satisfies clustering on its key but maps
    * keys to different partition ids than a hash-partitioned sibling, which
    * would silently mis-join. `StatefulOpClusteredDistribution` is the
    * pattern Spark's own stateful streaming operators use for exactly this
    * positional-pairing contract: it is satisfied ONLY by
    * `HashPartitioning(keys, n)` with this exact `n`, so EnsureRequirements
    * re-exchanges any pre-shuffled input that is not byte-for-byte
    * co-partitioned, and AQE will not coalesce the two sides apart.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else {
      // the configured floor, NOT numShufflePartitions: with AQE +
      // initialPartitionNum the latter is the self-sizing ceiling, and a
      // stateful-op distribution at the ceiling would pin 16x partitions
      // that AQE may never coalesce (same finding as
      // GraftSession.parallelismFloor)
      val n = conf.defaultNumShufflePartitions
      StatefulOpClusteredDistribution(leftKeys, n) ::
        StatefulOpClusteredDistribution(rightKeys, n) :: Nil
    }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val isInner = inner
    val keyTypes = lKeys.map(_.dataType)
    val tsTypes = Seq(lTs.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(tsTypes)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // next unconsumed right row (copied: child iterators reuse buffers)
        private var rCurr: InternalRow = _
        private var rCurrKey: InternalRow = _
        // newest right row already consumed for the current key region
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var nextRow: InternalRow = _

        private def fetchRight(): Boolean = {
          if (rCurr != null) return true
          if (!rIter.hasNext) return false
          rCurr = rIter.next().copy()
          rCurrKey = rKeyProj(rCurr).copy()
          true
        }

        private def advance(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            // consume right rows that are at or before this left row
            var continue = true
            while (continue && fetchRight()) {
              val cmp = keyOrd.compare(rCurrKey, lKey)
              if (cmp < 0) {
                // right key already passed by the ascending left side
                rCurr = null
              } else if (cmp > 0) {
                continue = false
              } else if (tsOrd.compare(rTsProj(rCurr), lTsProj(l)) <= 0) {
                lastMatch = rCurr
                lastMatchKey = rCurrKey
                rCurr = null
              } else {
                continue = false
              }
            }
            val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
            if (matched) return joined(l, lastMatch)
            if (!isInner) return joined(l, nullRight)
            // inner + unmatched: fall through to the next left row
          }
          null
        }

        override def hasNext: Boolean = {
          if (nextRow == null) nextRow = advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }
}
