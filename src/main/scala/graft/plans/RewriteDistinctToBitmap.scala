package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule (opt-in): rewrite `count(DISTINCT k)` over an integral
  * key into the Expand-free two-level bitmap aggregation q61 ships by hand:
  *
  * {{{
  *   Aggregate(G, count(DISTINCT k))
  *     ==>
  *   Aggregate(G, coalesce(sum(bitmap_count(bm)), 0),
  *     Aggregate(G + bitmap_bucket_number(k),
  *       bm = bitmap_construct_agg(bitmap_bit_position(k))))
  * }}}
  *
  * Why: Spark plans a single distinct aggregate as two physical phases
  * whose first shuffle carries EVERY distinct (G, k) pair — shuffle volume
  * equals distinct cardinality, the thing that dominates a 100 TB distinct
  * count. The bitmap form shuffles one ≤4 KB bitmap per (G, occupied
  * 32k-id bucket), independent of how many billions of distinct ids there
  * are, and remains EXACT. The rewrite makes the idiom free for user SQL
  * (Thrift / notebook sessions that won't hand-write q61's shape).
  *
  * Off by default: enable with `spark.graft.bitmapDistinct.enabled=true`.
  * Bitmap buckets materialize 4 KB per (group, bucket) even when only one
  * id in the bucket is present, so a LOW-cardinality distinct (where ids
  * are sparse across buckets) can be slower than the stock plan — the
  * caller, not the library, knows which regime a query lives in. (The
  * stock rewrite stays the default for the same reason Spark keeps it.)
  *
  * Semantics preserved (spec-pinned differentials):
  *  - NULL keys: count(DISTINCT) ignores them; `bitmap_bit_position(NULL)`
  *    is NULL and bitmap_construct_agg skips NULL positions, so the NULL
  *    group-bucket contributes an empty bitmap → 0.
  *  - Empty input, global aggregate: the inner GROUPED aggregate emits
  *    zero rows, the outer `sum` is NULL → `coalesce(..., 0)` restores
  *    count's 0 (types preserved: count and the coalesced sum are both
  *    LongType).
  *  - Negative ids: bucket/position are total functions of the long value;
  *    the round-trip is exact for the full id range (fixture-pinned).
  *
  * Matching is conservative — it fires only when:
  *  - every grouping expression is a plain Attribute,
  *  - exactly the distinct-count aliases in the output are rewritten, each
  *    `Alias(count(DISTINCT k))` with ONE integral, deterministic,
  *    filter-free key,
  *  - every other output column is a grouping attribute (no other
  *    aggregate functions — mixing re-aggregable partials into the inner
  *    level is a correctness cliff this rule refuses to walk near).
  * Output attribute ids and names are preserved, so nothing downstream
  * re-resolves.
  */
object RewriteDistinctToBitmap extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.bitmapDistinct.enabled"

  private def enabled: Boolean =
    // Defensive parse: a stray value like "1" must disable the rule, not
    // throw IllegalArgumentException into every subsequent optimization.
    SQLConf.get.getConfString(ConfKey, "false").equalsIgnoreCase("true")

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Alias(count(DISTINCT k)) with an integral deterministic key. */
  private object DistinctCount {
    def unapply(e: NamedExpression): Option[(Alias, Expression)] = e match {
      case a @ Alias(
            AggregateExpression(Count(Seq(key)), Complete, true, None, _), _)
          if integral(key) && key.deterministic =>
        Some((a, key))
      case _ => None
    }
  }

  private def eligible(agg: Aggregate): Boolean = {
    val groupIds = agg.groupingExpressions.collect {
      case a: Attribute => a.exprId
    }.toSet
    agg.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
      agg.aggregateExpressions.exists(DistinctCount.unapply(_).isDefined) &&
      agg.aggregateExpressions.forall {
        case DistinctCount(_, _) => true
        case a: Attribute => groupIds.contains(a.exprId)
        case _ => false
      } &&
      // one distinct key only: rewriting several would need one inner
      // aggregate per key (a different plan shape, not attempted)
      agg.aggregateExpressions.flatMap(DistinctCount.unapply(_))
        .map(_._2.canonicalized).distinct.size == 1
  }

  /** The bitmap scalar expressions are RuntimeReplaceable, and this rule
    * runs AFTER the optimizer's ReplaceExpressions batch — introduce their
    * replacements directly or execution hits "Cannot generate code". */
  private def concrete(e: Expression): Expression = e.transformUp {
    case r: RuntimeReplaceable => r.replacement
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate if eligible(agg) =>
        val rawKey = agg.aggregateExpressions
          .flatMap(DistinctCount.unapply(_)).head._2
        // the bitmap expressions declare ImplicitCastInputTypes(LongType),
        // but implicit casts only run during ANALYSIS — this rule runs
        // after, so a Byte/Short/Int key must be cast explicitly or the
        // injected StaticInvoke receives a type it rejects at runtime
        val key =
          if (rawKey.dataType == LongType) rawKey else Cast(rawKey, LongType)
        val groupAttrs =
          agg.groupingExpressions.map(_.asInstanceOf[Attribute])
        // inner level: one bitmap per (G, 32k-id bucket); the bucket is
        // grouped on but not output — the outer level never needs it
        val bm = Alias(
          AggregateExpression(
            BitmapConstructAgg(concrete(BitmapBitPosition(key))),
            Complete, isDistinct = false),
          "graft_bm")()
        val inner = Aggregate(
          groupAttrs :+ concrete(BitmapBucketNumber(key)),
          (groupAttrs: Seq[NamedExpression]) :+ bm,
          agg.child)
        // outer level: OR-free popcount sum (buckets are disjoint id
        // ranges, so bitmap_count per bucket sums exactly)
        val newAggExprs = agg.aggregateExpressions.map {
          case DistinctCount(alias, _) =>
            Alias(
              Coalesce(Seq(
                AggregateExpression(
                  Sum(concrete(BitmapCount(bm.toAttribute))),
                  Complete, isDistinct = false),
                Literal(0L))),
              alias.name)(exprId = alias.exprId)
          case other => other
        }
        Aggregate(groupAttrs, newAggExprs, inner)
    }
}
