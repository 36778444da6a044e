package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through [[AsOfJoin]] — the `Rule[LogicalPlan]` leg of the
  * Catalyst extension (alongside the Expression, Strategy, and SparkPlan
  * legs). A custom logical node is an optimizer BARRIER: Catalyst's own
  * ColumnPruning doesn't know which child columns it consumes, so without
  * this rule every scan beneath an as-of join reads ALL columns — at 100 TB
  * that's the difference between scanning two columns of a wide fact table
  * and scanning thirty.
  *
  * The rewrite: for `Project(_, AsOfJoin(l, r, …))`, compute the attributes
  * the projection and the join itself (keys + order) reference, and insert
  * child Projects keeping only those — which Catalyst's existing rules then
  * push all the way into the parquet scan (`ReadSchema`). Fixed point:
  * when the children already produce exactly the needed columns the plan is
  * returned unchanged.
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val needed = AttributeSet(
        p.references ++ (j.leftKeys ++ j.rightKeys ++ j.leftOrd ++ j.rightOrd)
          .flatMap(_.references))
      val lKeep = j.left.output.filter(needed.contains)
      val rKeep = j.right.output.filter(needed.contains)
      if (lKeep.size == j.left.output.size && rKeep.size == j.right.output.size) p
      else p.copy(child = j.copy(
        left = Project(lKeep, j.left),
        right = Project(rKeep, j.right)))
  }
}
