package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** The engine's whole-operator Catalyst extension: a NATIVE as-of join
  * — logical node, planner strategy, and a streaming merge-join
  * physical operator, mounted through SparkSessionExtensions.
  *
  * Why a custom SparkPlan when [[graft.ops.TemporalJoins.asOf]] already
  * composes the semantics from union + window? The composed form must
  * SHUFFLE AND SORT THE UNION — every left row rides through the
  * window sort alongside the right rows, and the window state machine
  * evaluates per row. The native operator instead asks Catalyst for
  * the textbook physical contract (children clustered on the key,
  * sorted by (key, ts)); EnsureRequirements plans one exchange + sort
  * PER SIDE, and the exec zips co-partitioned iterators in a single
  * forward pass with O(1) state (the last right row seen per key).
  * That is the plan a feature store wants at 100 TB: no union blowup,
  * output stays (key, ts)-sorted for downstream merges, and the right
  * side can be orders of magnitude smaller than the left without
  * paying the union's combined sort.
  *
  * Semantics match `asOf` backward mode exactly: latest right row with
  * `r.ts <= l.ts` per key (inclusive); left rows with no predecessor
  * get nulls; null keys/timestamps never match. v1 contract: key and
  * ts are LongType on both sides (the wrapper enforces it) — the
  * physical loop reads primitives, no comparator dispatch.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)

  protected override def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(Seq(lkOrd, ltOrd, rkOrd, rtOrd).forall(_ >= 0), "as-of key/ts not found in child output")
    val rightWidth = right.output.size
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outTypes)
      // O(1) merge state: the last right row consumed and its key.
      var curKey = 0L
      var curPayload: InternalRow = null
      lIter.map { l =>
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) project(joiner(l, nullRight))
        else {
          val lk = l.getLong(lkOrd)
          val lt = l.getLong(ltOrd)
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            // Null right keys/ts sort first under Ascending; skip them.
            if (head.isNullAt(rkOrd) || head.isNullAt(rtOrd)) rBuf.next()
            else {
              val rk = head.getLong(rkOrd)
              if (rk < lk || (rk == lk && head.getLong(rtOrd) <= lt)) {
                curKey = rk
                curPayload = rBuf.next().copy() // unsafe rows are reused buffers
              } else advance = false
            }
          }
          val matched = curPayload != null && curKey == lk
          project(joiner(l, if (matched) curPayload else nullRight))
        }
      }
    }
  }
}

/** Column-level wrapper: prepares a slim right side (`asof_`-prefixed
  * payload, internal long key/ts), builds the resolved logical node,
  * and returns a DataFrame. Requires GraftExtensions on the session
  * (it mounts [[AsOfJoinStrategy]]).
  */
object NativeAsOf {
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           payload: Seq[String]): DataFrame = {
    val rightSlim = right.select(
      (col(key).as("__asof_k") +: col(tsCol).as("__asof_t") +:
        payload.map(p => col(p).as(s"asof_$p"))): _*)
      .filter(col("__asof_k").isNotNull && col("__asof_t").isNotNull)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSlim.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val lk = attr(lPlan, key); val lt = attr(lPlan, tsCol)
    val rk = attr(rPlan, "__asof_k"); val rt = attr(rPlan, "__asof_t")
    require(Seq(lk, lt, rk, rt).forall(_.dataType == LongType),
      s"native asOf v1 requires LongType key/ts; got ${Seq(lk, lt, rk, rt).map(_.dataType)}")
    GraftBridge.ofRows(left.sparkSession, AsOfJoinPlan(lPlan, rPlan, lk, lt, rk, rt))
      .drop("__asof_k", "__asof_t")
  }
}
