package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.Uuid5Expr

/** Optimizer rule: `uuid5(a) = uuid5(b)  ⇒  a = b`.
  *
  * uuid5 is injective for practical purposes (deterministic SHA-1 minting,
  * SURVEY.md §2.5 K1), so comparing minted ids equals comparing source ids.
  * Rewriting join/filter conditions this way keeps the raw key available for
  * partition pruning and avoids hashing both sides of a join key twice.
  */
object Uuid5JoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case EqualTo(Uuid5Expr(a), Uuid5Expr(b)) =>
      EqualTo(a, b)
    }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => Uuid5JoinRewrite)
}
