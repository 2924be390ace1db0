package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, HintInfo, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: broadcast join sides that are PROVABLY at most one
  * row (`maxRows <= 1` — ungrouped aggregates, LIMIT 1, single-row
  * relations).
  *
  * Why it exists: the scalar-threshold pattern this engine leans on
  * (join a fact table against `SELECT max(ts) ...` / `SELECT avg(x)
  * ...`) degenerates to a full sort-merge or shuffled-hash join of the
  * fact side when the user forgets an explicit `broadcast()` hint and
  * size estimates are missing or disabled — a 1-row side shuffled
  * against billions of rows. Catalyst's own broadcast decision is
  * size-ESTIMATE based; `maxRows` is a logical GUARANTEE, so this
  * rewrite is always safe.
  *
  * Registered through GraftExtensions (injectOptimizerRule), the
  * (d)-level extension point alongside the expression and strategy
  * injections (SURVEY.md §7.3). */
object TinyAggBroadcast extends Rule[LogicalPlan] {

  private def isTiny(plan: LogicalPlan): Boolean =
    plan.maxRows.exists(_ <= 1L)

  private val bcast = Some(HintInfo(
    strategy = Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val l = if (isTiny(left)) bcast else None
      val r = if (isTiny(right)) bcast else None
      if (l.isDefined || r.isDefined) j.copy(hint = JoinHint(l, r)) else j
  }
}
