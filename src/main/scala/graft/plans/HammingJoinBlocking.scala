package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive Hamming-threshold similarity join
  *
  * {{{ a JOIN b ON bit_count(a.sig ^ b.sig) <= k [AND …] }}}
  *
  * — which Catalyst can only plan as a nested-loop/cartesian O(|a|·|b|)
  * comparison — into a union of k+1 equi-joins on pigeonhole signature
  * blocks, each of which plans as a hash/sort-merge join (SURVEY.md §7.3
  * tier (c): whole-operator semantics Spark's built-ins can't reach).
  *
  * Soundness (same rows, same multiplicities, no dedup step needed):
  *  - Recall: split the signature's bit width into k+1 blocks; ≤ k
  *    differing bits leave at least one block exactly equal (pigeonhole),
  *    so every qualifying pair satisfies some branch's block equality.
  *  - No duplicates: branch i additionally requires blocks 0..i-1 to
  *    DIFFER, so each pair matches exactly the branch of its first equal
  *    block — the union is disjoint and preserves join multiplicity
  *    (a whole-row `distinct` would not).
  *  - Every branch keeps the full original condition, so no false
  *    positives. Null signatures fail both forms' predicates alike.
  *
  * Fires only when the join has no equi-key conjunct already (otherwise
  * Catalyst is fine without help) and the threshold is a small literal
  * (branch count = k+1). Injected via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object HammingJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  /** Branch count is k+1; past ~8 the rewrite's fan-out stops paying. */
  private val MaxThreshold = 8

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEquiKey = conjuncts.exists {
        case EqualTo(l, r) => spansBothSides(l, r, left, right)
        case EqualNullSafe(l, r) => spansBothSides(l, r, left, right)
        case _ => false
      }
      val hamming = conjuncts.collectFirst {
        case LessThanOrEqual(BitwiseCount(BitwiseXor(x, y)), IntegerLiteral(k))
            if k >= 0 && k <= MaxThreshold && spansBothSides(x, y, left, right) =>
          (x, y, k)
        case GreaterThanOrEqual(IntegerLiteral(k), BitwiseCount(BitwiseXor(x, y)))
            if k >= 0 && k <= MaxThreshold && spansBothSides(x, y, left, right) =>
          (x, y, k)
      }
      // duplicating the child plans k+1 times is only sound when every
      // expression involved is deterministic — a nondeterministic column
      // (rand(), monotonically_increasing_id()) would evaluate differently
      // per branch and break the disjoint-union argument
      val allDeterministic = cond.deterministic &&
        j.children.forall(c => c.find(_.expressions.exists(!_.deterministic)).isEmpty)
      hamming match {
        case Some((x, y, k)) if !hasEquiKey && allDeterministic =>
          val bits = x.dataType match {
            case LongType => 64
            case IntegerType => 32
            case _ => 0
          }
          if (bits == 0) j
          else {
            val blocks = k + 1
            def blockOf(e: Expression, i: Int): Expression = {
              val start = i * bits / blocks
              val width = (i + 1) * bits / blocks - start
              val mask = if (width == 64) -1L else (1L << width) - 1
              val maskLit = e.dataType match {
                case LongType => Literal(mask)
                case _ => Literal(mask.toInt)
              }
              BitwiseAnd(ShiftRightUnsigned(e, Literal(start)), maskLit)
            }
            val branches = (0 until blocks).map { i =>
              val eq = EqualTo(blockOf(x, i), blockOf(y, i))
              val priorDiffer = (0 until i).map(p =>
                Not(EqualTo(blockOf(x, p), blockOf(y, p))))
              val branchCond = (Seq(cond, eq) ++ priorDiffer).reduce(And)
              Join(left, right, Inner, Some(branchCond), hint): LogicalPlan
            }
            branches.reduce((a, b) => Union(Seq(a, b)))
          }
        case _ => j
      }
  }

  /** One side evaluable against `left`, the other against `right`. */
  private def spansBothSides(a: Expression, b: Expression,
                             left: LogicalPlan, right: LogicalPlan): Boolean =
    (canEvaluate(a, left) && canEvaluate(b, right)) ||
      (canEvaluate(a, right) && canEvaluate(b, left))
}
