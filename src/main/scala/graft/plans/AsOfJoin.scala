package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native as-of join: for every left row, attach the right row with the
  * greatest right timestamp ≤ the left timestamp within the same key
  * (LEFT OUTER semantics — unmatched left rows keep null right columns).
  *
  * This is the (c)-level custom-operator path from SURVEY.md §7.3: a
  * LogicalPlan node, a SparkStrategy, and a physical BinaryExecNode
  * whose distribution/ordering requirements make EnsureRequirements
  * insert the co-partitioning exchanges and per-partition sorts — the
  * execution itself is then a single linear merge per partition (no
  * join blowup, no window buffering; state = one remembered row).
  * The union+window rewrite (operators.Joins.asofJoin) remains the
  * builtin-only formulation; AsOfJoinSpec proves they agree and the
  * j12 catalog entry runs this operator against DuckDB's native
  * ASOF JOIN oracle.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same-key co-partitioning, exactly how SortMergeJoinExec asks for it
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition (key, ts) order → the merge below is one linear pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTs.eval(lRow)
        // SQL ASOF semantics: NULL keys/timestamps never match (DuckDB
        // oracle parity). NULL-keyed left rows sort first and skip the
        // advance entirely; NULL right keys/timestamps are consumed so
        // they cannot block later rows, but never become the match.
        if (lk != null && lt != null) {
          // advance the right side to the last row with key == lk, ts <= lt
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            val ht = if (hk == null) null else rTs.eval(head)
            val kc = if (hk == null) -1 else keyOrd.compare(hk, lk)
            if (kc < 0 || (kc == 0 &&
                (ht == null || tsOrd.compare(ht, lt) <= 0))) {
              val consumed = rBuf.next()
              if (kc == 0 && ht != null) {
                lastMatch = consumed.copy() // rows are reused buffers
                // Re-evaluate the key off the COPIED row: `hk` from the
                // reused sort-iterator buffer is silently mutated when the
                // iterator advances for buffer-backed types (UTF8String,
                // binary, struct, decimal).
                lastMatchKey = rKey.eval(lastMatch)
              }
            } else advancing = false
          }
        }
        val matched = lk != null && lt != null && lastMatch != null &&
          keyOrd.compare(lastMatchKey, lk) == 0
        if (matched) joined(lRow, lastMatch) else joined(lRow, nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry point. */
object AsOfJoin {

  /** Register the planner strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** left ASOF LEFT JOIN right ON left.keyCol = right.keyCol AND
    * left.tsCol >= right.tsCol. Column names of the two sides must be
    * disjoint apart from the join columns (rename beforehand). */
  def asof(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame =
    asofMulti(left, right, Seq(leftKeyCol), Seq(rightKeyCol),
      leftTsCol, rightTsCol)

  /** Composite-key as-of join: the key is the tuple of `leftKeyCols` /
    * `rightKeyCols` (same arity). The exec is unchanged — a struct of
    * the key columns hash-partitions, sorts and compares exactly like a
    * scalar key (SQL NULL semantics note: a NULL inside a composite key
    * is a valid struct field, so unlike a scalar NULL key it can match;
    * pre-filter if your domain forbids that). */
  def asofMulti(left: DataFrame, right: DataFrame,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTsCol: String, rightTsCol: String): DataFrame = {
    require(leftKeyCols.nonEmpty && leftKeyCols.size == rightKeyCols.size,
      s"key arity mismatch: $leftKeyCols vs $rightKeyCols")
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    def key(plan: LogicalPlan, names: Seq[String]): Expression =
      if (names.size == 1) attr(plan, names.head)
      else org.apache.spark.sql.catalyst.expressions.CreateStruct(
        names.map(attr(plan, _)))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      key(lPlan, leftKeyCols), key(rPlan, rightKeyCols),
      attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
