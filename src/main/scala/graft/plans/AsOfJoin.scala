package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
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
    // Generated evaluation (DECISIONS.md #2 / VERDICT_r02 stretch):
    // per-row work is two codegen'd (key, ts) UnsafeProjections and two
    // codegen'd orderings over the projected rows — no interpreted
    // expression trees, no boxing for primitive keys. GenerateOrdering /
    // UnsafeProjection carry interpreted fallbacks and a codegen cache,
    // so per-partition generate() calls amortize to a map lookup.
    val keyDt = leftKey.dataType
    val tsDt = leftTs.dataType
    val rightWidth = right.output.size
    val lExprs = Seq(BindReferences.bindReference(leftKey, left.output),
      BindReferences.bindReference(leftTs, left.output))
    val rExprs = Seq(BindReferences.bindReference(rightKey, right.output),
      BindReferences.bindReference(rightTs, right.output))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projected layout: field 0 = key, field 1 = ts
      val lProj = UnsafeProjection.create(lExprs)
      val rProj = UnsafeProjection.create(rExprs)
      val keyOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, keyDt, nullable = true), Ascending)))
      val tsOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(1, tsDt, nullable = true), Ascending)))
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      var lastMatch: InternalRow = null
      var lastMatchExt: InternalRow = null // copied (key, ts) of lastMatch

      lIter.map { lRow =>
        val lExt = lProj(lRow) // buffer reused per left row — no copies held
        // SQL ASOF semantics: NULL keys/timestamps never match (DuckDB
        // oracle parity). NULL-keyed left rows sort first and skip the
        // advance entirely; NULL right keys/timestamps are consumed so
        // they cannot block later rows, but never become the match.
        if (!lExt.isNullAt(0) && !lExt.isNullAt(1)) {
          // advance the right side to the last row with key == lk, ts <= lt
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val hExt = rProj(rBuf.head)
            val hkNull = hExt.isNullAt(0)
            val htNull = hkNull || hExt.isNullAt(1)
            val kc = if (hkNull) -1 else keyOrd.compare(hExt, lExt)
            if (kc < 0 || (kc == 0 &&
                (htNull || tsOrd.compare(hExt, lExt) <= 0))) {
              val consumed = rBuf.next()
              if (kc == 0 && !htNull) {
                lastMatch = consumed.copy() // rows are reused buffers
                // Re-project off the COPIED row: hExt points at rProj's
                // reused result buffer, which the next projection call
                // overwrites.
                lastMatchExt = rProj(lastMatch).copy()
              }
            } else advancing = false
          }
        }
        val matched = !lExt.isNullAt(0) && !lExt.isNullAt(1) &&
          lastMatch != null && keyOrd.compare(lastMatchExt, lExt) == 0
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
