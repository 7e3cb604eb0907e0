package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, SortExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Static plan auditor for the anti-patterns that kill a plan at 100 TB.
  *
  * A plan that "works" at sf0.1 can hide a quadratic join or a
  * whole-dataset single-task funnel that only shows up at three orders of
  * magnitude more data. `audit` walks the PHYSICAL plan (post-AQE where
  * available) and reports:
  *
  *  - `cartesian-product`  — CartesianProductExec: |L|·|R| row expansion.
  *  - `nested-loop-join`   — BroadcastNestedLoopJoinExec: per-row scan of
  *    the broadcast side; fine for tiny sides, a wall for anything else
  *    (usually a non-equi condition that should be bucketed, cf. q62).
  *  - `single-partition-window` — WindowExec with an empty partitionSpec:
  *    every row moves through ONE task (the q74 lesson — use the two-phase
  *    PrefixSum instead).
  *  - `single-partition-exchange` — a shuffle INTO one partition feeding a
  *    sort or window: the whole dataset serializes through one task.
  *
  * Findings are advisory: a deliberate 20-row aggregate doesn't care that
  * its window is unpartitioned (q208 does exactly that on |sources| rows).
  * The value is making the decision VISIBLE — ExplainMain prints findings
  * next to the plan, and tests pin "no findings" on the hot-path queries
  * where any of these would be a regression.
  */
object PlanLint {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"[$rule] $node"
  }

  def audit(df: DataFrame): Seq[Finding] = audit(df.queryExecution.executedPlan)

  def audit(plan: SparkPlan): Seq[Finding] = {
    // AQE wraps subtrees in AdaptiveSparkPlanExec / QueryStageExec whose
    // children are not `children` — unwrap so collect sees the real tree
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: QueryStageExec        => p +: walk(q.plan)
      case _                        => p +: p.children.flatMap(walk)
    }
    val nodes = walk(plan)
    def head(p: SparkPlan): String = p.simpleStringWithNodeId().take(120)
    // under AQE a consumer's child is a ShuffleQueryStageExec wrapping the
    // exchange, not the exchange itself — unwrap before identity checks
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec        => unwrap(q.plan)
      case other                    => other
    }

    nodes.flatMap {
      case c: CartesianProductExec =>
        Some(Finding("cartesian-product", head(c)))
      case j: BroadcastNestedLoopJoinExec =>
        Some(Finding("nested-loop-join", head(j)))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some(Finding("single-partition-window", head(w)))
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        // only flag when real per-row work sits on top (sort/window);
        // a final single-partition exchange under a global agg is benign
        val consumers = nodes.filter(_.children.exists(c => unwrap(c) eq e))
        val hot = consumers.exists {
          case _: SortExec | _: WindowExec => true
          case _ => false
        }
        if (hot) Some(Finding("single-partition-exchange", head(e))) else None
      case _ => None
    }
  }
}
