package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Pass-through marker a query author wraps around the FACT side's
  * join key to declare it SKEWED — the opt-in signal
  * [[SaltedJoinRewrite]] fires on, the join twin of [[SkewHint]]
  * (learn WHICH keys are hot from the C40 `key_skew` profile; this is
  * how you tell the planner). `salts` is the replication factor the
  * rewrite uses. Evaluates to its child byte-for-byte, so a bailed-out
  * plan — or a session without the rule installed — computes the exact
  * same result: the hint can never change semantics, only plans. */
case class SkewJoinHint(child: Expression, salts: Int)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): SkewJoinHint = copy(child = newChild)
  override def sql: String = s"graft_skew_join_hint(${child.sql}, $salts)"
}

/** Optimizer rule: rewrite a hint-tagged equi-JOIN on a skewed fact
  * key into the replicate-dim / salt-fact two-phase form the C11
  * `join_salted` query proved by hand through r14
  * ([[graft.operators.Skew.saltedJoin]]) — the third session-injected
  * rule beside [[TopKRewrite]] and [[SaltedAggRewrite]], closing the
  * skew story for JOINS the way r14 closed it for aggregations.
  *
  * Matched shape: an INNER join whose condition contains exactly one
  * equi-conjunct `SkewJoinHint(factKey) = dimKey` (either side of the
  * `=`), factKey resolving to one child and dimKey to the other. The
  * rewrite emits
  *
  *   Project(join.output,                       — salt columns dropped,
  *     Join(Inner,                                original exprIds kept
  *       Project(fact.* :+ pmod(spark_partition_id(), S) AS _graft_fsalt),
  *       Generate(explode([0..S-1]) AS _graft_dsalt, dim),
  *       cond ∧ _graft_fsalt = _graft_dsalt))
  *
  * Why this is exactly the same function: each dim row is replicated
  * once per salt value, and a fact row carries ONE salt value, so
  * every original (fact, dim) key match meets exactly one replica —
  * output multiset identical whether or not dim keys are unique. What
  * changes is the SHUFFLE: the join key becomes (key, salt), so a hot
  * fact key's rows spread over S reducers instead of converging on
  * one, at the cost of shipping the dim side S times — the standard
  * skew-join trade a 1000-executor plan makes when one key is 30% of
  * the fact table and AQE's split-by-size can't help (e.g. the skewed
  * side feeds further co-partitioned stages, or the straggler is CPU
  * not bytes).
  *
  * Safety (the TopKRewrite discipline — bail out unless provably the
  * same function):
  *  - INNER joins only: under outer joins the dim-side replication
  *    changes unmatched-row semantics (an unmatched LEFT fact row is
  *    safe, but proving which side is safe per join type is exactly
  *    the subtlety a bail-out avoids; the hint is advisory).
  *  - exactly ONE hinted conjunct, a plain `=` between attributes —
  *    non-equi comparisons, expression keys and double-hinted
  *    conditions keep their plan.
  *  - the whole condition must be deterministic.
  *  - 2 ≤ salts ≤ 256 (a 1-salt rewrite is a no-op; an unbounded one
  *    is a dim-side explosion).
  * Whether the rewrite fires or bails, every [[SkewJoinHint]] marker
  * is stripped before physical planning (pass-through, so the
  * unrewritten plan runs untouched on bail-out). */
object SaltedJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transform {
      case j: Join if j.condition.exists(
          _.exists(_.isInstanceOf[SkewJoinHint])) =>
        rewrite(j).getOrElse(j)
    }
    // strip every remaining marker (bail-outs, hints outside the
    // matched shape, constraint-inferred copies): SkewJoinHint is a
    // pass-through, so this is always a semantic no-op
    rewritten.transformAllExpressions { case SkewJoinHint(c, _) => c }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val cond = j.condition.get
    if (!cond.deterministic) return None
    val conjuncts = splitConjunctivePredicates(cond)
    val hintedEq = conjuncts.collect {
      case eq @ EqualTo(SkewJoinHint(a: AttributeReference, s),
          b: AttributeReference) => (eq, a, b, s)
      case eq @ EqualTo(a: AttributeReference,
          SkewJoinHint(b: AttributeReference, s)) => (eq, b, a, s)
    }
    // any other conjunct carrying a marker (double hint, hint under a
    // non-equi comparison) disqualifies the whole join
    val markers = conjuncts.count(_.exists(_.isInstanceOf[SkewJoinHint]))
    if (hintedEq.size != 1 || markers != 1) return None
    val (_, factKey, dimKey, salts) = hintedEq.head
    if (salts < 2 || salts > 256) return None
    val (fact, dim, factIsLeft) =
      if (j.left.outputSet.contains(factKey) &&
        j.right.outputSet.contains(dimKey)) (j.left, j.right, true)
      else if (j.right.outputSet.contains(factKey) &&
        j.left.outputSet.contains(dimKey)) (j.right, j.left, false)
      else return None

    // fact: one deterministic salt per input partition (the
    // SaltedAggRewrite salt — stable within a task, uniform across)
    val fSalt = Alias(
      Pmod(Cast(SparkPartitionID(), LongType), Literal(salts.toLong)),
      "_graft_fsalt")()
    val fact2 = Project(fact.output :+ fSalt, fact)

    // dim: replicate once per salt value
    val dSalt = AttributeReference("_graft_dsalt", LongType,
      nullable = false)()
    val dim2 = Generate(
      Explode(CreateArray((0 until salts).map(i => Literal(i.toLong)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(dSalt), child = dim)

    val stripped = conjuncts.map(_.transform {
      case SkewJoinHint(c, _) => c
    })
    val newCond = (stripped :+
      EqualTo(fSalt.toAttribute, dSalt).asInstanceOf[Expression])
      .reduce(And)
    val (l, r) = if (factIsLeft) (fact2, dim2) else (dim2, fact2)
    // original output attributes pass through untouched (same exprIds)
    Some(Project(j.output, Join(l, r, Inner, Some(newCond), j.hint)))
  }
}
