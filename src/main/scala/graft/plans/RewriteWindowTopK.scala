package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the standard per-key top-k idiom
  *
  *   Project(cols, Filter(rn <= k, Window(row_number() over (partition by
  *   p order by o) as rn, child)))
  *
  * into the bounded [[TopKPerKey]] operator — users (and the engine's own
  * operators) write the declarative window formulation and the engine
  * plans it without a full shuffle+sort, the same way Catalyst's own
  * InferWindowGroupLimit upgrades rank filters (ours goes further: the
  * heap operator eliminates the per-partition sort entirely, not just its
  * input size).
  *
  * Guards:
  *   - only `row_number` (rank/dense_rank keep >k rows on ties — not
  *     expressible as a bounded heap of k);
  *   - non-empty partition spec (a global top-k is Spark's own
  *     TakeOrderedAndProject) and non-empty ordering.
  *
  * When the projection still references the row_number column, the
  * operator is planted in rank-emitting mode (the final pass appends the
  * 1-based rank, sorting each key's ≤ k retained rows); otherwise the
  * cheaper no-rank mode runs.
  *
  * Tie semantics: with a non-total `order by`, which rows row_number
  * retains is already nondeterministic in Spark (partition-order
  * dependent); the heap retains an equally valid selection, so the
  * rewrite preserves the declared semantics exactly when the ordering is
  * total and up-to-ties otherwise — the same contract as the window it
  * replaces.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** cond == `rn <= k` in any spelling; yields (rnAttr, k). */
  private object RnLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case _ => None
    }
  }

  /** Kill switch: the heap operator assumes selective top-k (keys ≪
    * rows); at degenerate key cardinality WindowExec's sort is faster, so
    * the rewrite can be disabled per-query/session without code changes.
    */
  val enabledKey = "spark.graft.rewriteWindowTopK"

  /** Degenerate-limit guard: a rank filter like `rn <= 100000000` is an
    * effectively-unbounded retain — the heap operator would hold ~all
    * rows per key in memory, where WindowExec's external sort spills.
    * Past this k the window plan stays.
    */
  val maxK = 1 << 20

  /** Float/double partition keys bail out: NormalizeFloatingNumbers runs
    * AFTER the operator-optimization batch this rule sits in, so a
    * replaced Window node would hash -0.0 vs 0.0 (and NaN bit patterns)
    * as distinct keys in both the exchange and the heap map — silently
    * diverging from WindowExec's normalized grouping.
    */
  private def containsFloat(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
    case a: ArrayType => containsFloat(a.elementType)
    case m: MapType => containsFloat(m.keyType) || containsFloat(m.valueType)
    case _ => false
  }
  private def floatKey(ps: Seq[Expression]): Boolean =
    ps.exists(e => containsFloat(e.dataType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(enabledKey, "true").toBoolean) plan
    else applyRewrite(plan)

  private def applyRewrite(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Project(projList,
        Filter(RnLimit(rnAttr, k),
        Window(Seq(al @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)), _, _, child, _)))
        if k >= 1 && k <= maxK && ps.nonEmpty && os.nonEmpty &&
          !floatKey(ps) && rnAttr.exprId == al.exprId =>
      val rankKept = projList.exists(_.references.contains(al.toAttribute))
      val rank = if (rankKept) Some(al.toAttribute) else None
      Project(projList, TopKPerKey(ps, os, k, child, rank))

    // Bare filter (no enclosing projection): the rank column is part of
    // the result, so plant the operator in rank-emitting mode. Output
    // attribute order matches the Window node (child.output :+ rn).
    case Filter(RnLimit(rnAttr, k),
        Window(Seq(al @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)), _, _, child, _))
        if k >= 1 && k <= maxK && ps.nonEmpty && os.nonEmpty &&
          !floatKey(ps) && rnAttr.exprId == al.exprId =>
      TopKPerKey(ps, os, k, child, Some(al.toAttribute))
  }
}
