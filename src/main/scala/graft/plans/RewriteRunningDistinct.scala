package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Complete, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the running-distinct window idiom
  *
  * {{{ size(collect_set(k) OVER (PARTITION BY p ORDER BY o
  *                               ROWS UNBOUNDED PRECEDING .. CURRENT ROW)) }}}
  *
  * into the constant-state first-occurrence form:
  *
  * {{{ sum(CASE WHEN row_number() OVER (PARTITION BY p, k ORDER BY o) = 1
  *              AND k IS NOT NULL THEN 1 ELSE 0 END)
  *       OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED .. CURRENT ROW) }}}
  *
  * Why: the collect_set form keeps the ENTIRE distinct set in the window
  * buffer for every row — O(distinct-so-far) state per row, the thing that
  * OOMs a 100 TB window at high key cardinality. The rewritten form keeps
  * one counter: a key contributes exactly once, at its first occurrence in
  * the partition's order, and the running sum of those flags IS the
  * running distinct count. Cost moves to one extra window pass (sorted on
  * (p, k), then on p), both with constant per-row state.
  *
  * Semantics: equivalent for the ROWS UNBOUNDED PRECEDING..CURRENT ROW
  * frame (the only frame matched). collect_set drops NULL keys, so the
  * flag is zeroed for NULL k. Under orderSpec ties both forms are
  * tie-order-dependent in the same way (a ROWS frame is physical-order);
  * with a total order they agree exactly (spec-pinned differential,
  * NULL keys and duplicates included).
  *
  * Matching is deliberately conservative. After analysis the idiom is a
  * Project computing `size(_we0)` above a Window computing `_we0 =
  * collect_set(k) OVER spec`, so the rule matches exactly that pair and
  * fires only when every reference to the window output sits under
  * `size(...)` — any other use of the array keeps the original plan. The
  * rewritten count keeps the Size expression's Int type and the Project's
  * output attribute ids, so nothing downstream re-resolves. */
object RewriteRunningDistinct extends Rule[LogicalPlan] {

  private val runningFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  /** alias(collect_set(k) OVER (.. ROWS UNBOUNDED..CURRENT)) in a Window's
    * expression list → (alias, key, spec) */
  private object CollectSetRunning {
    def unapply(e: NamedExpression): Option[(Alias, Expression, WindowSpecDefinition)] = e match {
      case a @ Alias(
            WindowExpression(
              AggregateExpression(CollectSet(key, _, _), Complete, false, None, _),
              spec @ WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            _) =>
        Some((a, key, spec))
      case _ => None
    }
  }

  private def referencesOnlyUnderSize(projectList: Seq[NamedExpression], attr: Attribute): Boolean = {
    // every occurrence of attr must be directly inside Size(attr)
    def badUse(e: Expression): Boolean = e match {
      case Size(a: Attribute, _) if a.exprId == attr.exprId => false
      case a: Attribute if a.exprId == attr.exprId => true
      case other => other.children.exists(badUse)
    }
    !projectList.exists(badUse)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case p @ Project(projectList, w: Window) if w.orderSpec.nonEmpty && {
          w.windowExpressions.exists {
            case c @ CollectSetRunning(_, _, _) =>
              referencesOnlyUnderSize(projectList, c.toAttribute)
            case _ => false
          }
        } =>
      val (matched, others) = w.windowExpressions.partition {
        case c @ CollectSetRunning(_, _, _) =>
          referencesOnlyUnderSize(projectList, c.toAttribute)
        case _ => false
      }

      // non-matching window expressions stay in the original operator
      val base: LogicalPlan =
        if (others.isEmpty) w.child
        else w.copy(windowExpressions = others)

      var replacements = Map.empty[ExprId, Attribute]
      val rewritten = matched.foldLeft(base) { (child, expr) =>
        val Some((alias, key, spec)) = CollectSetRunning.unapply(expr): @unchecked
        // inner pass: first-occurrence rank per (partition, key)
        val rnSpec = WindowSpecDefinition(
          spec.partitionSpec :+ key, spec.orderSpec, runningFrame)
        val rnAlias = Alias(WindowExpression(RowNumber(), rnSpec), "graft_rd_rn")()
        val inner = Window(Seq(rnAlias), rnSpec.partitionSpec, spec.orderSpec, child)
        // outer pass: running sum of first-occurrence flags, original spec
        val flag = If(
          And(IsNotNull(key), EqualTo(rnAlias.toAttribute, Literal(1))),
          Literal(1L), Literal(0L))
        val sumExpr = WindowExpression(
          AggregateExpression(Sum(flag), Complete, isDistinct = false),
          WindowSpecDefinition(spec.partitionSpec, spec.orderSpec, runningFrame))
        val cntAlias = Alias(sumExpr, s"graft_rd_cnt_${alias.name}")()
        replacements += alias.exprId -> cntAlias.toAttribute
        Window(Seq(cntAlias), spec.partitionSpec, spec.orderSpec, inner)
      }

      // swap size(arrayAttr) for the Int-cast running count; ids preserved
      val newProjectList = projectList.map { ne =>
        ne.transform {
          case Size(a: Attribute, _) if replacements.contains(a.exprId) =>
            Cast(replacements(a.exprId), IntegerType)
        }.asInstanceOf[NamedExpression]
      }
      Project(newProjectList, rewritten)
  }
}
